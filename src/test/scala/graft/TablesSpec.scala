package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Tables.events]]' ts normalization across the fixture-generation
  * variants that have actually shipped: the driver regenerated the
  * testdata between rounds 7 and 9, silently switching `events.ts` from
  * parquet TIMESTAMP(NANOS) (read as a long under the nanosAsLong conf)
  * to TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ),
  * which broke every events-based query for a full round. Whatever the
  * generator emits next, the contract is: callers always see a plain
  * TimestampType `ts` at microsecond precision, on the UTC wall clock.
  */
class TablesSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-events-").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // 2020-01-01T00:00:00.123456Z as epoch micros
  private val micros = 1577836800L * 1000000L + 123456L

  test("events: nanos-as-long fixtures truncate ns -> us and yield TimestampType") {
    val dir = freshDir()
    import spark.implicits._
    // ts carries sub-microsecond nanos (…789) that must truncate away,
    // exactly like DuckDB's ns->us cast on the oracle side
    Seq((1L, micros * 1000L + 789L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(unixMicros(ev) == micros)
  }

  test("events: TIMESTAMP_NTZ fixtures cast to TimestampType on the same wall clock") {
    val dir = freshDir()
    import spark.implicits._
    Seq((1L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(lit(micros)).cast(TimestampNTZType))
      .write.parquet(s"$dir/events.parquet")
    // sanity: the file really round-trips as NTZ, mirroring the current fixtures
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
      TimestampNTZType)
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(unixMicros(ev) == micros)
  }

  test("events: current sf0.001 fixture resolves to TimestampType") {
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType)
  }

  private def unixMicros(ev: org.apache.spark.sql.DataFrame): Long =
    ev.select(unix_micros(col("ts"))).head().getLong(0)
}
