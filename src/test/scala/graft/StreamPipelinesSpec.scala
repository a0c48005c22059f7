package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamPipelines

/** End-to-end file-source streaming runs: read the events fixture as a
  * stream (Trigger.AvailableNow = drain all present files, then stop) and
  * check the streaming results equal the batch equivalents.
  */
class StreamPipelinesSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  private def stageEventsDir(): String = {
    // file stream sources want a directory of files, not a single file
    val dir = Files.createTempDirectory("graft_stream_events").toFile
    dir.deleteOnExit()
    Tables.events(spark, sf).write.mode("overwrite").parquet(dir.toString)
    dir.toString
  }

  test("file SINK round trip: streamed dedup written as parquet equals batch") {
    val dir = stageEventsDir()
    val outDir = Files.createTempDirectory("graft_stream_sink").toFile
    outDir.deleteOnExit()
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toFile
    ckpt.deleteOnExit()
    val q = StreamPipelines.dedupedEvents(StreamPipelines.readEvents(spark, dir))
      .select(col("event_id"), col("event_type"))
      .writeStream.format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val sunk = spark.read.parquet(outDir.toString)
    val batch = spark.read.parquet(dir).dropDuplicates("event_id")
    assert(sunk.count() === batch.count(),
      "file sink must carry exactly the deduped event set")
    assert(sunk.select("event_id").distinct().count() === sunk.count(),
      "no event_id may appear twice in the sink output")
  }

  test("file-stream hourly counts equal the batch aggregation") {
    val dir = stageEventsDir()
    val q = StreamPipelines.hourlyCounts(StreamPipelines.readEvents(spark, dir))
      .writeStream.format("memory").queryName("sp_hourly")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode only emits watermark-closed windows; compare those
    val streamed = spark.table("sp_hourly")
    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
    val joined = streamed.select(col("w_start"), col("event_type"),
        col("n").as("n_stream"))
      .join(batch, Seq("w_start", "event_type"), "inner")
    val total = streamed.count()
    assert(total > 0, "stream should emit at least the closed windows")
    assert(joined.filter(col("n_stream") =!= col("n")).count() === 0,
      "every emitted window must match the batch count")
  }

  test("GraftExtensions installs into a SparkSessionExtensions instance") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext) // must not throw
    // and the lazily-registered path resolves in SQL on the live session
    graft.functions.NativeExprs.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
    // bloom build + probe pair works end-to-end in plain SQL
    spark.range(100).createOrReplaceTempView("ext_bloom_keys")
    val hits = spark.sql(
      """SELECT count(*) FROM (SELECT id FROM range(200)) t
         WHERE graft_might_contain(
           (SELECT graft_bloom_agg(id, 100L, 959L) FROM ext_bloom_keys),
           t.id)""").head().getLong(0)
    assert(hits >= 100 && hits < 150, s"bloom probe hits=$hits")
  }

  test("streaming dedup emits each event_id once") {
    val dir = stageEventsDir()
    val q = StreamPipelines.dedupedEvents(StreamPipelines.readEvents(spark, dir))
      .writeStream.format("memory").queryName("sp_dedup")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("sp_dedup")
    assert(out.count() === out.select("event_id").distinct().count())
  }
}
