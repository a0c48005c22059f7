package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-only semantics (SURVEY.md §2.9 #57–59) that the DuckDB batch
  * oracle cannot express: watermark-based late-data drop, dedup within a
  * watermark, and arbitrary per-key state via flatMapGroupsWithState. Each
  * runs a MemoryStream through the same operators the batch queries use.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(3600L * 1000 + m * 60000L)

  test("tumbling window agg over a stream matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
    val q = agg.writeStream.format("memory").queryName("t_tumble")
      .outputMode(OutputMode.Complete).start()
    mem.addData((ts(1), 1.0), (ts(5), 2.0), (ts(11), 4.0), (ts(19), 8.0))
    q.processAllAvailable()
    val rows = spark.table("t_tumble")
      .select(col("window.start"), col("n"), col("s"))
      .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1),
        r.getDouble(2))).toSet
    q.stop()
    assert(rows === Set((60L, 2L, 3.0), (70L, 2L, 12.0)))
  }

  test("watermark drops data later than the allowed lateness") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("t_late")
      .outputMode(OutputMode.Append).start()
    mem.addData((ts(5), 1.0))
    q.processAllAvailable()
    mem.addData((ts(45), 1.0)) // advances watermark to :35, closes [:00,:10)
    q.processAllAvailable()
    mem.addData((ts(7), 9.0)) // later than watermark → dropped
    q.processAllAvailable()
    mem.addData((ts(75), 1.0)) // closes [:40,:50)
    q.processAllAvailable()
    val emitted = spark.table("t_late")
      .select(col("window.start"), col("n"))
      .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1)))
      .toMap
    q.stop()
    assert(emitted(60L) === 1L, "late row must not re-open the closed window")
  }

  test("dropDuplicatesWithinWatermark dedups a replayed event id") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val dedup = mem.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.format("memory").queryName("t_dedup")
      .outputMode(OutputMode.Append).start()
    mem.addData((ts(1), 100L), (ts(2), 100L), (ts(3), 101L))
    q.processAllAvailable()
    mem.addData((ts(4), 100L)) // replay within watermark → dropped
    q.processAllAvailable()
    val n = spark.table("t_dedup").count()
    q.stop()
    assert(n === 2, s"expected 2 distinct events, got $n")
  }

  test("stream-stream join matches purchases to prior clicks in-horizon") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long, Double)]
    val out = graft.streaming.StreamPipelines.purchasesWithPriorClick(
      clicks.toDF().toDF("cts", "cuid"),
      buys.toDF().toDF("bts", "buid", "amount"))
    val q = out.writeStream.format("memory").queryName("t_ssjoin")
      .outputMode(OutputMode.Append).start()
    clicks.addData((ts(1), 1L), (ts(2), 2L))
    buys.addData((ts(5), 1L, 9.5), (ts(30), 2L, 1.0)) // user 2: past horizon
    q.processAllAvailable()
    val rows = spark.table("t_ssjoin").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    q.stop()
    assert(rows.toSeq === Seq((1L, 9.5)),
      s"only user 1's purchase is within 10 min of a click, got ${rows.toSeq}")
  }

  test("stream-static join enriches each micro-batch with no state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = MemoryStream[(Timestamp, Long, String)]
    val dim = Seq(("click", 1L), ("purchase", 10L)).toDF(
      "event_type", "weight")
    val out = graft.streaming.StreamPipelines.enrichedEvents(
      events.toDF().toDF("ts", "user_id", "event_type"), dim)
    val q = out.writeStream.format("memory").queryName("t_enrich")
      .outputMode(OutputMode.Append).start()
    events.addData((ts(1), 1L, "click"), (ts(2), 2L, "purchase"),
      (ts(3), 3L, "error")) // no dim row — inner join drops it
    q.processAllAvailable()
    events.addData((ts(4), 4L, "click")) // second batch re-joins the dim
    q.processAllAvailable()
    val rows = spark.table("t_enrich").collect()
      .map(r => (r.getLong(1), r.getLong(3))).sorted
    q.stop()
    assert(rows.toSeq === Seq((1L, 1L), (2L, 10L), (4L, 1L)))
    assert(q.lastProgress.stateOperators.isEmpty ||
      q.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
      "stream-static join must keep zero streaming state")
  }

  test("foreachBatch parquet sink snapshots running totals idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink")
      .toString + "/totals"
    val events = MemoryStream[(Timestamp, Long, String)]
    val q = graft.streaming.StreamPipelines.totalsToParquetSink(
      events.toDF().toDF("ts", "user_id", "event_type"), dir)
    def snapshot(): Map[String, (Long, Long)] =
      spark.read.parquet(dir).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    events.addData((ts(1), 1L, "click"), (ts(2), 1L, "click"),
      (ts(3), 2L, "view"))
    q.processAllAvailable()
    assert(snapshot() === Map("click" -> ((2L, 2L)), "view" -> ((1L, 2L))))
    // next batch REPLACES the snapshot with the new running totals
    events.addData((ts(4), 3L, "click"))
    q.processAllAvailable()
    q.stop()
    assert(snapshot() === Map("click" -> ((3L, 5L)), "view" -> ((1L, 2L))))
  }

  test("corpusIngest stream: quality gate, fingerprint dedup, stratified keep") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Timestamp)]
    // ids chosen so the en keep-rate hash decides deterministically:
    // (id%1000*761)%1000 < 500 → keep. 2:1522%1000=522<500? no→drop;
    // 4: (4*761)%1000=44 keep; de rows default-keep.
    val out = graft.streaming.StreamPipelines.corpusIngest(
      mem.toDF().toDF("doc_id", "text", "lang", "ts"))
    val q = out.writeStream.format("memory").queryName("t_ingest")
      .outputMode(OutputMode.Append).start()
    val good = "the quick brown fox jumps over the lazy dog again"
    mem.addData(
      (4L, good, "en", ts(1)),                  // kept (hash 44 < 500)
      (2L, good + " twice", "en", ts(2)),       // dropped by hash (522)
      (7L, good + " thrice", "de", ts(3)),      // kept (default rate)
      (9L, good, "en", ts(4)),                  // exact dup of 4 → dedup
      (11L, "spam spam spam spam spam spam", "de", ts(5)), // low ttr
      (13L, "too short", "de", ts(6)))          // < 5 tokens
    q.processAllAvailable()
    val kept = spark.table("t_ingest").collect()
      .map(r => r.getLong(0)).toSet
    q.stop()
    assert(kept === Set(4L, 7L), s"expected {4, 7}, got $kept")
  }

  test("flatMapGroupsWithState maintains running per-key counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val counted = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          Iterator((uid, n, s))
      }
    val q = counted.toDF("uid", "n", "s")
      .writeStream.format("memory").queryName("t_state")
      .outputMode(OutputMode.Append).start()
    mem.addData((1L, 1.0), (1L, 2.0), (2L, 10.0))
    q.processAllAvailable()
    mem.addData((1L, 4.0))
    q.processAllAvailable()
    val last = spark.table("t_state").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
    q.stop()
    assert(last(1L) === ((3L, 7.0)), "state must accumulate across batches")
    assert(last(2L) === ((1L, 10.0)))
  }

  test("transformWithState (Spark 4 API) keeps running per-key totals") {
    import org.apache.spark.sql.streaming.{GroupState => _, _}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    class RunningTotal
        extends StatefulProcessor[Long, (Long, Double), (Long, Double)] {
      @transient private var total: ValueState[Double] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        total = getHandle.getValueState[Double]("total",
          org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
          timerValues: TimerValues): Iterator[(Long, Double)] = {
        var t = if (total.exists()) total.get() else 0.0
        rows.foreach(t += _._2)
        total.update(t)
        Iterator((key, t))
      }
    }
    val out = mem.toDS()
      .groupByKey(_._1)
      .transformWithState(new RunningTotal, TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    // transformWithState needs a multi-column-family store (RocksDB)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = out.toDF("uid", "total")
        .writeStream.format("memory").queryName("t_tws")
        .outputMode("append").start()
      mem.addData((1L, 1.5), (1L, 2.5), (2L, 10.0))
      q.processAllAvailable()
      mem.addData((1L, 6.0))
      q.processAllAvailable()
      val last = spark.table("t_tws").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      q.stop()
      assert(last(1L) === 10.0, "state must carry across micro-batches")
      assert(last(2L) === 10.0)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming funnel advances per-user state only on the next step") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamPipelines.funnelAdvances(mem.toDS())
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = out.toDF("uid", "step_idx", "step")
        .writeStream.format("memory").queryName("t_funnel")
        .outputMode("append").start()
      // user 1 starts the funnel; user 2's view is premature (no signup)
      mem.addData((1L, "signup"), (1L, "view"), (2L, "view"))
      q.processAllAvailable()
      // state carries across batches: user 1 finishes; user 2's purchase
      // is skipped (next expected step after signup is view)
      mem.addData((1L, "click"), (1L, "purchase"),
        (2L, "signup"), (2L, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("t_funnel").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      q.stop()
      assert(rows === Set((1L, 1, "signup"), (1L, 2, "view"),
        (1L, 3, "click"), (1L, 4, "purchase"), (2L, 1, "signup")))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming Misra-Gries heavy hitters: exact under capacity, " +
      "classical decrement-eviction over it, state carried across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, String)]
    val out = graft.streaming.StreamPipelines.heavyHitterItems(
      mem.toDS(), capacity = 2)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = out.toDF("k", "item", "est")
        .writeStream.format("memory").queryName("t_mg")
        .outputMode("append").start()
      mem.addData(("t", "a"), ("t", "a"), ("t", "b"), ("u", "x"))
      q.processAllAvailable()
      // snapshot 1: t → {a:2, b:1} (exact: 2 distinct ≤ capacity); u → {x:1}
      val snap1 = spark.table("t_mg").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(snap1 === Set(("t", "a", 2L), ("t", "b", 1L), ("u", "x", 1L)))
      // batch 2 for t: c hits a FULL summary → decrement all (a 2→1,
      // b 1→0 evicted, c not inserted); then a → 2; then c takes the
      // freed slot → 1. u stays exact across the batch handoff.
      mem.addData(("t", "c"), ("t", "a"), ("t", "c"),
        ("u", "x"), ("u", "y"))
      q.processAllAvailable()
      val all = spark.table("t_mg").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      q.stop()
      assert(all.length === 3 + 4, "batch 2 must emit 4 snapshot rows")
      // multiset-subtract batch 1's emission: what batch 2 emitted
      val batch2 = all.diff(snap1.toSeq).toSet
      assert(batch2 === Set(("t", "a", 2L), ("t", "c", 1L),
        ("u", "x", 2L), ("u", "y", 1L)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("legacy flatMapGroupsWithState running counts accumulate " +
      "across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamPipelines
      .runningCountsLegacy(mem.toDS())
    val q = out.toDF("k", "n")
      .writeStream.format("memory").queryName("t_legacy")
      .outputMode("append").start()
    mem.addData((1L, "a"), (1L, "b"), (2L, "c"))
    q.processAllAvailable()
    mem.addData((1L, "d"))
    q.processAllAvailable()
    val rows = spark.table("t_legacy").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(rows === Set((1L, 2L), (2L, 1L), (1L, 3L)))
  }

  test("timer sessionizer: the watermark closes idle sessions; " +
      "in-batch gaps split on arrival") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val out = graft.streaming.StreamPipelines.sessionStream(
      mem.toDS().withWatermark("_2", "10 seconds"), gapMs = 15000L)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = out.toDF("k", "s_ms", "e_ms", "n")
        .writeStream.format("memory").queryName("t_sess")
        .outputMode("append").start()
      // user 1: two events 5 s apart (one session); user 4: two events
      // 10 MINUTES apart in the same batch — the first closes on arrival
      mem.addData((1L, t("2024-01-01 10:00:00")),
        (1L, t("2024-01-01 10:00:05")),
        (4L, t("2024-01-01 10:00:00")), (4L, t("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // a far-future event advances the watermark past every armed
      // timer; one more batch lets the timers fire
      mem.addData((3L, t("2024-01-01 11:00:00")))
      q.processAllAvailable()
      mem.addData((3L, t("2024-01-01 11:30:00")))
      q.processAllAvailable()
      val rows = spark.table("t_sess").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      q.stop()
      def ms(s: String) = t(s).getTime
      // user 1's idle session closed BY TIMER (no second arrival did it);
      // user 4's first session closed by the in-batch gap, its second by
      // timer once the watermark passed; user 3's last session stays open
      assert(rows === Set(
        (1L, ms("2024-01-01 10:00:00"), ms("2024-01-01 10:00:05"), 2L),
        (4L, ms("2024-01-01 10:00:00"), ms("2024-01-01 10:00:00"), 1L),
        (4L, ms("2024-01-01 10:10:00"), ms("2024-01-01 10:10:00"), 1L),
        (3L, ms("2024-01-01 11:00:00"), ms("2024-01-01 11:00:00"), 1L)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming CUSUM integrates sustained drift across batches and " +
      "resets after the alarm") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Long)]
    // target 100, slack 10 (drift must exceed ±10 to accumulate),
    // alarm when a sum crosses 50
    val out = graft.streaming.StreamPipelines.cusumPoints(
      mem.toDS(), target = 100L, slack = 10L, threshold = 50L)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = out.toDF("k", "seq", "sp", "sn", "alarm")
        .writeStream.format("memory").queryName("t_cusum")
        .outputMode("append").start()
      // t drifts UP: in-band 105 decays to 0, then 120/140/150 integrate
      // 10+30+40 and cross 50 at seq 4 — the alarm needs the CARRIED sum
      // (no single point exceeds threshold+slack on its own deviation);
      // u drifts DOWN: 60 and 40 integrate 30+50 on the negative side
      mem.addData(("t", 105L), ("t", 120L), ("u", 100L))
      q.processAllAvailable()
      mem.addData(("t", 140L), ("t", 150L), ("u", 60L), ("u", 40L))
      q.processAllAvailable()
      val rows = spark.table("t_cusum").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).toSet
      q.stop()
      assert(rows === Set(
        ("t", 1L, 0L, 0L, false), ("t", 2L, 10L, 0L, false),
        ("t", 3L, 40L, 0L, false), ("t", 4L, 80L, 0L, true),
        ("u", 1L, 0L, 0L, false), ("u", 2L, 0L, 30L, false),
        ("u", 3L, 0L, 80L, true)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming EWMA replays the batch recurrence across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Long)]
    val out = graft.streaming.StreamPipelines.ewmaPoints(mem.toDS())
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = out.toDF("k", "seq", "ewma")
        .writeStream.format("memory").queryName("t_ewma")
        .outputMode("append").start()
      // same series AnalyticsOpsSpec hand-computes for the batch twin:
      // [4e6, 8e6, 12e6] -> e = [4e6, 5e6, 6_750_000]; split across
      // micro-batches so the state handoff is load-bearing
      mem.addData(("t", 4000000L), ("t", 8000000L), ("u", 2000000L))
      q.processAllAvailable()
      mem.addData(("t", 12000000L))
      q.processAllAvailable()
      val rows = spark.table("t_ewma").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      q.stop()
      assert(rows === Set(("t", 1L, 4000000L), ("t", 2L, 5000000L),
        ("t", 3L, 6750000L), ("u", 1L, 2000000L)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming attribution credits purchases to the last prior click") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Long, Long)]
    val out = graft.streaming.StreamPipelines.attributionCredits(mem.toDS())
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = out.toDF("uid", "campaign", "value_units")
        .writeStream.format("memory").queryName("t_attr")
        .outputMode("append").start()
      // user 1: click c7 then purchase (credited); user 2: purchase with
      // no prior click (dropped, the batch unattributed convention);
      // a click with no campaign (-1) must not overwrite state
      mem.addData((1L, "click", 7L, 0L), (1L, "purchase", -1L, 1000L),
        (2L, "purchase", -1L, 500L), (1L, "click", -1L, 0L))
      q.processAllAvailable()
      // state carries across batches: user 1's second purchase still
      // credits c7; a new click c9 then retargets the third purchase
      mem.addData((1L, "purchase", -1L, 250L), (1L, "click", 9L, 0L),
        (1L, "purchase", -1L, 125L), (2L, "click", 3L, 0L))
      q.processAllAvailable()
      // user 2's click from batch 2 attributes their batch-3 purchase
      mem.addData((2L, "purchase", -1L, 64L))
      q.processAllAvailable()
      val rows = spark.table("t_attr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      q.stop()
      assert(rows === Set((1L, 7L, 1000L), (1L, 7L, 250L),
        (1L, 9L, 125L), (2L, 3L, 64L)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming KLL snapshots exact quantiles below the compaction cap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Double)]
    val out = graft.streaming.StreamPipelines.quantilePoints(mem.toDS(),
      quantiles = Array(0.5))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = out.toDF("k", "n", "est")
        .writeStream.format("memory").queryName("t_kll")
        .outputMode("append").start()
      // 100 values < k=512: no compaction, snapshots are EXACT order
      // statistics — rank ceil(0.5·60)=30 after batch 1, 50 after batch 2
      mem.addData((1 to 60).map(i => ("a", i.toDouble)): _*)
      q.processAllAvailable()
      mem.addData((61 to 100).map(i => ("a", i.toDouble)): _*)
      q.processAllAvailable()
      val rows = spark.table("t_kll").collect()
        .map(r => (r.getLong(1), r.getSeq[Double](2).head)).toSet
      q.stop()
      assert(rows === Set((60L, 30.0), (100L, 50.0)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("observe() + listener exposes MR-style job counters") {
    @volatile var seen: Option[Long] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          duration: Long): Unit =
        qe.observedMetrics.get("li_metrics")
          .foreach(r => seen = Some(r.getAs[Long]("rows_seen")))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Tables.lineitem(spark, sf)
        .observe("li_metrics", count(lit(1)).as("rows_seen"))
        .filter(col("l_quantity") > 25)
      val out = df.count()
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (seen.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(seen.exists(_ > out),
        s"observed rows_seen=$seen should exceed filtered count=$out")
    } finally spark.listenerManager.unregister(listener)
  }

  test("accumulators count task-side events like MR counters") {
    val acc = spark.sparkContext.longAccumulator("high_qty")
    import spark.implicits._
    val n = Tables.lineitem(spark, sf)
      .select(col("l_quantity")).as[Double]
      .map { q => if (q > 40) acc.add(1); q }
      .filter(_ > 0).count()
    assert(n > 0)
    assert(acc.value > 0 && acc.value < n)
  }
}
