package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY.md §2.9): the same event-time
  * operators the batch registry exposes, over an unbounded source. These
  * builders return streaming DataFrames — callers attach a sink with
  * `.writeStream` (see StreamingSpec for MemoryStream-driven tests and
  * StreamPipelinesSpec for file-source micro-batch runs).
  *
  * Scale notes: every pipeline here is incrementally executable — windowed
  * aggregations keyed by (window, key) with watermark-bounded state, and
  * dedup state that expires at the watermark. Nothing buffers unbounded
  * history.
  */
object StreamPipelines {

  /** The events schema as the file stream source needs it declared. */
  val eventsSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** File-based streaming read of an events directory (parquet files
    * appearing over time = the classic ingestion pattern).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /** Tumbling 1-hour counts per event type with a 30-minute watermark. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_v"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_v"))

  /** Per-user session aggregation (17-minute gap) with watermark. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "17 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("n_events"))

  /** Streaming exact dedup on event_id within the watermark horizon. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
}
