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

  test("streaming incremental dedup: per-batch ledgers union to the " +
      "batch incoming×index result") {
    import spark.implicits._
    import graft.operators.DedupOps
    // index: 60 docs, 3-token shared header + 20 unique tokens each
    val header = "h0 h1 h2"
    val indexRows = (0 until 60).map { i =>
      val unique = (0 until 20).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, "en", "web", s"$header $unique")
    }
    val index = indexRows.toDF("doc_id", "lang", "source", "text")
    // incoming: truncated re-crawls of every 6th index doc (high Jaccard)
    // plus 5 fresh docs that must match nothing
    val recrawls = indexRows.filter(_._1 % 6 == 0).map { case (id, l, s, t) =>
      (id + 1000L, l, s, t.split(" ").dropRight(5).mkString(" "))
    }
    val fresh = (0 until 5).map { i =>
      (2000L + i, "en", "web", (0 until 23).map(j => s"f${i}_$j").mkString(" "))
    }
    // two staged files + maxFilesPerTrigger=1 → at least two micro-batches;
    // each file carries some re-crawls so BOTH batches emit ledger rows
    // (an all-fresh batch appends an empty ledger with no batch_id rows)
    val (rc1, rc2) = recrawls.splitAt(recrawls.size / 2)
    val dir = Files.createTempDirectory("graft_stream_docs").toFile
    dir.deleteOnExit()
    rc1.toDF("doc_id", "lang", "source", "text")
      .coalesce(1).write.parquet(s"$dir/f1")
    (rc2 ++ fresh).toDF("doc_id", "lang", "source", "text")
      .coalesce(1).write.parquet(s"$dir/f2")
    val outDir = Files.createTempDirectory("graft_stream_incdedup").toFile
    outDir.deleteOnExit()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, lang STRING, source STRING, text STRING")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
    val q = StreamPipelines.incrementalDedupSink(
      stream, index, 0.3, outDir.toString)
    q.awaitTermination(120000)
    val ledger = spark.read.parquet(outDir.toString)
    assert(ledger.select("batch_id").distinct().count() >= 2,
      "maxFilesPerTrigger=1 over two files must yield two micro-batches")
    val got = ledger.select("new_id", "matched_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = DedupOps.incrementalNearDupsOn(index,
        (recrawls ++ fresh).toDF("doc_id", "lang", "source", "text"), 0.3)
      .select("new_id", "matched_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "re-crawls must match their originals")
    assert(got === want)
    assert(got.forall { case (n, _) => n < 2000L },
      "fresh docs must match nothing in the index")
  }

  test("streaming ANN ingest: per-batch assignment ledgers union to the " +
      "batch probe of the same prebuilt index") {
    import spark.implicits._
    import graft.operators.SimOps
    val d = 8
    def vec(axis: Int, eps: Double): Seq[Double] =
      Seq.tabulate(d)(j =>
        if (j == axis) 1.0 else if (j == (axis + 1) % d) eps else 0.0)
    // ids 0 and 1 seed one cluster each (dense-id seeding, nlist = 2)
    val index = Seq(
      0L -> vec(0, 0.0), 1L -> vec(4, 0.0),
      2L -> vec(0, 0.01), 3L -> vec(0, 0.02), 4L -> vec(0, 0.03),
      5L -> vec(4, 0.01), 6L -> vec(4, 0.02), 7L -> vec(4, 0.03))
      .toDF("vec_id", "v")
    val b1 = Seq(100L -> vec(4, 0.02), 101L -> vec(0, 0.03))
    val b2 = Seq(102L -> vec(0, 0.01), 103L -> vec(4, 0.04))
    val dir = Files.createTempDirectory("graft_stream_vecs").toFile
    dir.deleteOnExit()
    b1.toDF("vec_id", "v").coalesce(1).write.parquet(s"$dir/f1")
    b2.toDF("vec_id", "v").coalesce(1).write.parquet(s"$dir/f2")
    val outDir = Files.createTempDirectory("graft_stream_ann").toFile
    outDir.deleteOnExit()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, v ARRAY<DOUBLE>")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
    val q = StreamPipelines.incrementalAnnSink(stream, index, nlist = 2,
      outDir.toString)
    q.awaitTermination(120000)
    val ledger = spark.read.parquet(outDir.toString)
    assert(ledger.select("batch_id").distinct().count() === 2)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))
    val got = ledger.select("new_id", "home_cid", "rank", "nid")
      .collect().map(key).toSet
    val (cells, centroids) = SimOps.lloydCellsOn(spark, index, 2)
    val want = SimOps.incrementalAssignOn(spark, cells, centroids,
        (b1 ++ b2).toDF("vec_id", "v"), nprobe = 2, k = 3)
      .select("new_id", "home_cid", "rank", "nid")
      .collect().map(key).toSet
    assert(want.nonEmpty && got === want)
    assert(got.forall(_._4 < 8L), "neighbors must be index-side only")
  }

  test("streaming OOD admission gate: per-batch verdict ledgers union " +
      "to the batch oodFilter of the same pinned index + radii") {
    import spark.implicits._
    import graft.operators.SimOps
    import scala.math.{cos => mcos, sin => msin, Pi}
    def vec(deg: Double) = Seq(mcos(deg * Pi / 180), msin(deg * Pi / 180))
    // two angular clusters; distinct distances so radii are tie-free
    val index = (Seq(0L -> vec(0), 1L -> vec(90)) ++
      (2L to 21L).map(i => i -> vec((i - 2) * 0.7)) ++
      (22L to 25L).map(i => i -> vec(90 - (i - 22) * 0.9))).toDF("vec_id", "v")
    // batch 1: in-distribution re-arrivals; batch 2: a novel 45deg burst
    val b1 = Seq(100L -> vec(3.1), 101L -> vec(88.7))
    val b2 = Seq(102L -> vec(44.0), 103L -> vec(46.0))
    val dir = Files.createTempDirectory("graft_stream_ood").toFile
    dir.deleteOnExit()
    b1.toDF("vec_id", "v").coalesce(1).write.parquet(s"$dir/f1")
    b2.toDF("vec_id", "v").coalesce(1).write.parquet(s"$dir/f2")
    val outDir = Files.createTempDirectory("graft_stream_ood_out").toFile
    outDir.deleteOnExit()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, v ARRAY<DOUBLE>")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
    val q = StreamPipelines.oodAdmissionSink(stream, index, nlist = 2,
      outDir.toString)
    q.awaitTermination(120000)
    val ledger = spark.read.parquet(outDir.toString)
    assert(ledger.select("batch_id").distinct().count() === 2)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getInt(1),
      r.getLong(2), r.getLong(3), r.getBoolean(4))
    val got = ledger
      .select("vec_id", "cid", "du", "p95_units", "flagged")
      .collect().map(key).toSet
    val (cells, centroids) = SimOps.lloydCellsOn(spark, index, 2)
    val want = SimOps.oodFlagsOn(spark, cells, centroids,
        (b1 ++ b2).toDF("vec_id", "v"))
      .collect().map(key).toSet
    assert(got === want, "ledger must equal the batch actuator verdicts")
    val flagged = got.filter(_._5).map(_._1)
    assert(flagged === Set(102L, 103L),
      s"the 45deg burst is quarantined, re-arrivals admitted: $flagged")
  }

  test("streaming CDC apply: versioned snapshots advance per batch and " +
      "an at-least-once replay converges to the same snapshot") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cdc_root").toFile
    root.deleteOnExit()
    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$root/v0")
    val clDir = Files.createTempDirectory("graft_cdc_cl").toFile
    clDir.deleteOnExit()
    Seq(("U", 2L, "beta v2"), ("I", 4L, "delta"))
      .toDF("op", "doc_id", "text").coalesce(1).write.parquet(s"$clDir/f1")
    Seq(("D", 1L, null: String), ("I", 5L, "epsilon"))
      .toDF("op", "doc_id", "text").coalesce(1).write.parquet(s"$clDir/f2")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "op STRING, doc_id BIGINT, text STRING")
    def changes = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(clDir.toString)
    StreamPipelines.cdcApplySink(changes, root.toString, "doc_id", "op")
      .awaitTermination(120000)
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = Set((2L, "beta v2"), (3L, "gamma"), (4L, "delta"),
      (5L, "epsilon"))
    assert(rowsOf(
      StreamPipelines.latestCdcSnapshot(spark, root.toString)) === want)
    // at-least-once: a FRESH query (new checkpoint) replays the same
    // changelog files against the already-advanced root; the upsert
    // semantics converge to the identical snapshot instead of
    // double-applying or corrupting it
    StreamPipelines.cdcApplySink(changes, root.toString, "doc_id", "op")
      .awaitTermination(120000)
    assert(rowsOf(
      StreamPipelines.latestCdcSnapshot(spark, root.toString)) === want)
    // the seeded base version is untouched (versioned, never in place)
    assert(rowsOf(spark.read.parquet(s"$root/v0"))
      === Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
  }

  test("transformWithState state survives a stop-and-restart from " +
      "checkpoint: the resumed query continues the EWMA trajectory") {
    import spark.implicits._
    // One point per key per file, so within-batch row order cannot affect
    // the order-sensitive recurrence; the SECOND run's outputs depend on
    // the first run's persisted (seq, ewma) state — a fresh store would
    // emit seq=1 with the raw value, which the assertion distinguishes.
    val dir = Files.createTempDirectory("graft_restart_pts").toFile
    dir.deleteOnExit()
    val outDir = Files.createTempDirectory("graft_restart_out").toFile
    outDir.deleteOnExit()
    val ckpt = Files.createTempDirectory("graft_restart_ckpt").toFile
    ckpt.deleteOnExit()
    Seq(("a", 100L), ("b", 40L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$dir/f1")
    def runOnce(): Unit = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "k STRING, v BIGINT")
      val pts = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(dir.toString)
        .as[(String, Long)]
      val q = StreamPipelines.ewmaPoints(pts)
        .toDF("k", "seq", "ewma")
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    // transformWithState needs a multi-column-family store (RocksDB)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      runOnce() // drains f1, commits source offsets AND key state
      Seq(("a", 300L), ("b", 80L)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$dir/f2")
      runOnce() // a NEW query instance resumes from the checkpoint
      val got = spark.read.parquet(outDir.toString).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // e₁ = s₁; eₙ = (sₙ + 3·eₙ₋₁) div 4 continued ACROSS the restart
      assert(got === Set(
        ("a", 1L, 100L), ("b", 1L, 40L),
        ("a", 2L, (300L + 3 * 100L) / 4), // 150
        ("b", 2L, (80L + 3 * 40L) / 4))) // 50
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
