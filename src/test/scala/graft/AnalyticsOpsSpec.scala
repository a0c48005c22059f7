package graft

import graft.operators.{AggOps, IoOps, PipelineOps, SimOps, StreamOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable cases for the round-7 analytics additions: 3σ outlier
  * detection (integer-exact decision rule), the k-means cluster profile,
  * and the record-linkage entity pipeline (transitive closure across
  * deletion chains).
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("zscore outliers: flags exactly the planted spike, labeled hi") {
    import spark.implicits._
    // 30 values at 100.0 ± 1 and one spike at 1000: μ ≈ 129, σ ≈ 159,
    // 3σ band ≈ [−348, 606] — only the spike is outside, on the high side
    val vals = (1 to 30).map(i => (s"t", i.toLong, 100.0 + (i % 3 - 1))) :+
      (("t", 31L, 1000.0))
    val out = AggOps.zscoreOutliersOn(
      vals.toDF("event_type", "event_id", "value")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("event_id") === 31L)
    assert(out.head.getAs[String]("side") === "hi")
    assert(out.head.getAs[Int]("rank") === 1)
  }

  test("zscore outliers: a tight cluster with no spike flags nothing") {
    import spark.implicits._
    val vals = (1 to 20).map(i => ("t", i.toLong, 50.0 + (i % 5)))
    val out = AggOps.zscoreOutliersOn(
      vals.toDF("event_type", "event_id", "value"))
    assert(out.count() === 0)
  }

  test("kmeans profile partitions the whole corpus across the seed cells") {
    val prof = SimOps.kmeansProfile(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(prof.map(_.getAs[Long]("n_members")).sum === total,
      "every vector is assigned to exactly one cell")
    assert(prof.forall(r => r.getAs[Int]("cid") >= 0 &&
      r.getAs[Int]("cid") < 10), "cells are the 10 seed ids")
    assert(prof.forall(_.getAs[Long]("n_members") > 0))
  }

  test("ohlc: open/close pin the (ts, event_id) order, ties by event_id") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:05:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:20:00")
    // two events share t0 — open must come from the LOWER event_id (id 1)
    val e = Seq((2L, t0, "m", 7.0), (1L, t0, "m", 3.0), (3L, t1, "m", 5.0))
      .toDF("event_id", "ts", "event_type", "value")
    val r = StreamOps.ohlcOn(e).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Double]("open") === 3.0)
    assert(r.head.getAs[Double]("close") === 5.0)
    assert(r.head.getAs[Double]("high") === 7.0)
    assert(r.head.getAs[Double]("low") === 3.0)
    assert(r.head.getAs[Long]("n") === 3L)
  }

  test("mode: ties break toward the lexicographically smallest value") {
    import spark.implicits._
    val docs = Seq((1L, "s1", "en"), (2L, "s1", "de"), (3L, "s1", "de"),
      (4L, "s1", "en"), (5L, "s2", "fr")).toDF("doc_id", "source", "lang")
    val m = AggOps.modeOn(docs).collect()
    assert(m.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      === Seq(("s1", "de", 2L), ("s2", "fr", 1L)))
  }

  test("profile: distinct/null counts are internally consistent") {
    val p = IoOps.profileEvents(spark, sf).collect()
    assert(p.length === 6)
    p.foreach { r =>
      val (rows, nd, nn) = (r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_distinct"), r.getAs[Long]("n_nulls"))
      assert(nd + nn <= rows && nd >= 1,
        s"${r.getAs[String]("column_name")}: nd=$nd nn=$nn rows=$rows")
    }
    val ids = p.find(_.getAs[String]("column_name") == "event_id").get
    assert(ids.getAs[Long]("n_distinct") === ids.getAs[Long]("n_rows"),
      "event_id is unique")
  }

  test("bigram fluency: integral conditional frequencies, floor division") {
    import spark.implicits._
    // corpus bigrams: "a b"×2, "a c"×1 → c(a·)=3; doc1 "a b": (1000·2)//3
    // = 666; doc3 "a c": (1000·1)//3 = 333
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val f = TextOps.bigramFluencyOn(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(f === Map(1L -> 666L, 2L -> 666L, 3L -> 333L))
  }

  test("repeated spans: marks merge into maximal spans; far repeats split") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t"),                            // the shared 5-gram
      (2L, "a p q r s t b"),                        // one overlapping span
      (3L, "p q r s t z1 z2 z3 z4 z5 z6 p q r s t") // two separated spans
    ).toDF("doc_id", "text")
    val r = TextOps.repeatedSpansOn(docs).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(1L) === ((1L, 1L, 1L, 5L)))
    assert(r(2L) === ((3L, 1L, 1L, 5L)))
    // doc 3: 12 grams, repeats at pos 0 and 11 — gap > 4 → two spans of 5
    assert(r(3L) === ((12L, 2L, 2L, 10L)))
  }

  test("count-of-counts: N_r tabulates trigram frequencies exactly") {
    import spark.implicits._
    // "a b c" ×3 docs → one trigram type at r=3; "x y z w" → two types
    // at r=1
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"),
      (4L, "x y z w")).toDF("doc_id", "text")
    val n = AggOps.countOfCountsOn(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n === Map(1L -> 2L, 3L -> 1L))
  }

  test("time-to-convert: median is the lower-middle sorted delta") {
    import spark.implicits._
    def ev(id: Long, u: Long, t: String, ty: String) =
      (id, u, ty, java.sql.Timestamp.valueOf(t))
    // three users convert signup→view in 10 s, 20 s, 100 s → median 20;
    // only user 1 continues view→click (5 s)
    val e = Seq(
      ev(1, 1, "2024-01-01 00:00:00", "signup"),
      ev(2, 1, "2024-01-01 00:00:10", "view"),
      ev(3, 1, "2024-01-01 00:00:15", "click"),
      ev(4, 2, "2024-01-01 00:00:00", "signup"),
      ev(5, 2, "2024-01-01 00:00:20", "view"),
      ev(6, 3, "2024-01-01 00:00:00", "signup"),
      ev(7, 3, "2024-01-01 00:01:40", "view"))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = graft.operators.EventOps.timeToConvertOn(e).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r("1_signup->2_view") === ((3L, 10L, 20L, 100L)))
    assert(r("2_view->3_click") === ((1L, 5L, 5L, 5L)))
    assert(!r.contains("3_click->4_purchase"), "no converting users")
  }

  test("key skew: shares and exact positional percentiles") {
    import spark.implicits._
    // per-key counts 1,1,2,6 → n=10 rows; max share 600‰, top10 covers
    // everything (1000‰); sorted counts [1,1,2,6]: p50 at pos 2 → 1,
    // p99 at pos 4 → 6
    val ev = (Seq.fill(6)(10L) ++ Seq(20L, 20L, 30L, 40L))
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("event_id", "user_id")
    val r = AggOps.keySkewOn(ev).collect().head
    assert((r.getAs[Long]("n_keys"), r.getAs[Long]("n_rows"),
      r.getAs[Long]("max_count"), r.getAs[Long]("max_share_permille"),
      r.getAs[Long]("top10_share_permille"), r.getAs[Long]("p50_count"),
      r.getAs[Long]("p99_count")) === ((4L, 10L, 6L, 600L, 1000L, 1L, 6L)))
  }

  test("personalized pagerank: integral rounds are bit-deterministic") {
    val run1 = graft.operators.GraphOps.pageRankPersonalized(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val run2 = graft.operators.GraphOps.pageRankPersonalized(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(run1.nonEmpty && run1.length <= 20)
    assert(run1.forall(_._3 > 0), "unreached nodes are filtered")
    assert(run1.toSeq === run2.toSeq,
      "micro-unit arithmetic replays bit-for-bit")
    val seedMass = run1.filter(r => r._1 == "customer" && r._2 <= 3)
    assert(seedMass.nonEmpty, "a teleport seed holds visible mass")
  }

  test("linkage entities: deletion chains close transitively to one entity") {
    val ents = PipelineOps.linkageEntities(spark, sf).collect()
    assert(ents.nonEmpty)
    // canonical record is always a base row (ids < 1e6), every entity has
    // at least its planted variant, and every v2 (id ≥ 2e6) reached its
    // SOURCE through v1 — ed(source, v2) = 2, so membership of a base
    // canonical proves the transitive closure ran
    assert(ents.forall(_.getAs[Long]("cluster_id") < 1000000L))
    assert(ents.forall(_.getAs[Long]("n_members") >= 2))
    val chains = ents.filter(_.getAs[Long]("max_member") >= 2000000L)
    assert(chains.nonEmpty, "some entity contains a second-generation variant")
    assert(chains.forall(_.getAs[Long]("n_members") >= 3),
      "a v2 entity also holds the source and the v1 link")
  }

  test("ewma: the integer smoothing recurrence matches a hand computation") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:30:00")
    // hourly sums in micro-units: s = [4e6, 8e6, 12e6]
    // e1 = 4e6; e2 = (8e6 + 3·4e6) div 4 = 5e6;
    // e3 = (12e6 + 3·5e6) div 4 = 6_750_000
    val events = Seq(
      ("t", ts(0), 1.0), ("t", ts(0), 3.0), // hour 0 sums to 4.0
      ("t", ts(1), 8.0),
      ("t", ts(2), 12.0),
      ("u", ts(0), 2.0) // second key: independent series, e1 = s1
    ).toDF("event_type", "ts", "value")
    val out = StreamOps.ewmaOn(events).collect()
    val t = out.filter(_.getAs[String]("event_type") == "t")
      .map(r => (r.getAs[Long]("sum_units"), r.getAs[Long]("ewma_units")))
    assert(t.toSeq === Seq((4000000L, 4000000L), (8000000L, 5000000L),
      (12000000L, 6750000L)))
    val u = out.filter(_.getAs[String]("event_type") == "u")
      .map(r => (r.getAs[Long]("sum_units"), r.getAs[Long]("ewma_units")))
    assert(u.toSeq === Seq((2000000L, 2000000L)))
  }

  test("entropy: uniform mix is log2(k) bits, monolingual is zero") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "en"), ("s1", "en"), ("s1", "de"), ("s1", "de"), // H = 1.0
      ("s2", "fr"), ("s2", "fr"), ("s2", "fr"), ("s2", "fr"), // H = 0.0
      ("s3", "en"), ("s3", "de"), ("s3", "fr"), ("s3", "fr")  // H = 1.5
    ).toDF("source", "lang")
    val out = AggOps.entropyOn(docs, "source", "lang").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_symbols"), r.getAs[Double]("entropy_bits")))
    assert(out.toSeq === Seq(("s1", 4L, 2L, 1.0), ("s2", 4L, 1L, 0.0),
      ("s3", 4L, 3L, 1.5)))
  }

  test("mad outliers: lower-median rank rule flags only the far spike") {
    import spark.implicits._
    // v = 1..8 and 100: n=9, med = rank-5 value = 5, ad sorted
    // [0,1,1,2,2,3,3,4,95] → mad = rank-5 value = 2; the 3.5-modified-z
    // cut 6745·ad > 35000·mad flags ad > ~10.4, i.e. only the spike
    val events = ((1 to 8).map(i => ("t", i.toLong, i.toDouble)) :+
      (("t", 9L, 100.0))).toDF("event_type", "event_id", "value")
    val out = AggOps.madOutliersOn(events).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === 9L)
    assert(r.getAs[Long]("med_micro") === 5000000L)
    assert(r.getAs[Long]("mad_micro") === 2000000L)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Long]("max_absdev_micro") === 95000000L)
  }

  test("mad outliers: constant series has zero MAD and flags every deviation") {
    import spark.implicits._
    // 5 identical values and one bump: med = 7, mad = 0 — the rule
    // degenerates to "any deviation at all", the documented MAD=0 edge
    val events = ((1 to 5).map(i => ("t", i.toLong, 7.0)) :+
      (("t", 6L, 8.0))).toDF("event_type", "event_id", "value")
    val r = AggOps.madOutliersOn(events).head()
    assert(r.getAs[Long]("mad_micro") === 0L)
    assert(r.getAs[Long]("n_outliers") === 1L)
  }

  test("gini: equal split is 0, total concentration approaches (n-1)/n") {
    import spark.implicits._
    val rows = Seq(("eq", 1L, 5L), ("eq", 2L, 5L), ("eq", 3L, 5L),
      ("eq", 4L, 5L),
      ("conc", 1L, 0L), ("conc", 2L, 0L), ("conc", 3L, 0L),
      ("conc", 4L, 4L)).toDF("grp", "key", "x")
    val out = AggOps.giniOn(rows, "grp", "key", "x").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"),
        r.getAs[Long]("total"), r.getAs[Double]("gini"))).sortBy(_._1)
    // conc: G = (2·16 − 5·4)/(4·4) = 0.75 = (n−1)/n; eq: G = 0 exactly
    assert(out.toSeq === Seq(("conc", 4L, 4L, 0.75), ("eq", 4L, 20L, 0.0)))
  }

  test("stickiness: per-mille is floor(1000·sum_dau / (n_days·mau))") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2026-03-$d%02d $h%02d:00:00")
    // March: day 1 actives {1,2} (user 1 twice — deduped), day 2 {1}:
    // sum_dau 3, n_days 2, mau 2 → 1000·3 DIV 4 = 750
    val events = Seq((1L, ts(1, 9)), (1L, ts(1, 12)), (2L, ts(1, 10)),
      (1L, ts(2, 9))).toDF("user_id", "ts")
    val out = graft.operators.EventOps.stickinessOn(events).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("month") === "2026-03")
    assert(r.getAs[Long]("n_days") === 2L)
    assert(r.getAs[Long]("sum_dau") === 3L)
    assert(r.getAs[Long]("mau") === 2L)
    assert(r.getAs[Long]("stickiness_permille") === 750L)
  }

  test("benford: string-extracted digits, floor shares, reference permilles") {
    import spark.implicits._
    val xs = Seq(1L, 10L, 25L, 29L, 3L, 999L, 0L, -7L).toDF("x")
    val out = AggOps.benfordOn(xs, "x").collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n"),
        r.getAs[Long]("share_permille"), r.getAs[Long]("benford_permille")))
    // 0 and -7 are dropped; digits 1,1,2,2,3,9 over total 6
    assert(out.toSeq === Seq((1, 2L, 333L, 301L), (2, 2L, 333L, 176L),
      (3, 1L, 166L, 124L), (9, 1L, 166L, 45L)))
  }

  test("top paths: prefixes cap at five steps and count users exactly") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val rows =
      Seq(("a", 1), ("b", 2), ("c", 3)).map { case (t, m) => (1L, 10L + m, t, ts(m)) } ++
      Seq(("a", 1), ("b", 2), ("c", 3)).map { case (t, m) => (2L, 20L + m, t, ts(m)) } ++
      Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 5), ("f", 6))
        .map { case (t, m) => (3L, 30L + m, t, ts(m)) }
    val out = graft.operators.EventOps.pathsTopkOn(
      rows.toDF("user_id", "event_id", "event_type", "ts"), 5).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("a > b > c", 2L), ("a > b > c > d > e", 1L)))
  }

  test("equi-depth histogram: 10 rows over 4 buckets split 3/3/2/2 " +
      "with exact rank boundaries") {
    import spark.implicits._
    // values 10,20,…,100 — ntile(4) over 10 rows: buckets of 3,3,2,2
    val df = (1 to 10).map(i => (i * 10.0, i.toLong)).toDF("v", "id")
    val out = AggOps.equidepthHistOn(df, "v", Seq("id"), 4L).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1, 3L, 10.0, 30.0), (2, 3L, 40.0, 60.0),
      (3, 2L, 70.0, 80.0), (4, 2L, 90.0, 100.0)))
  }

  test("equi-depth histogram: skewed data still buckets by COUNT, " +
      "duplicate values split across boundaries deterministically") {
    import spark.implicits._
    // 8 copies of 1.0 then 2.0, 3.0 — equi-WIDTH would dump 8 rows in one
    // bin; equi-depth must cut the duplicates at the tie-broken rank
    val df = ((1 to 8).map(i => (1.0, i.toLong)) ++
      Seq((2.0, 9L), (3.0, 10L))).toDF("v", "id")
    val out = AggOps.equidepthHistOn(df, "v", Seq("id"), 5L).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1, 2L, 1.0, 1.0), (2, 2L, 1.0, 1.0),
      (3, 2L, 1.0, 1.0), (4, 2L, 1.0, 1.0), (5, 2L, 2.0, 3.0)))
  }

  test("groupLowerMedian: matches the per-group window formulation on " +
      "random grouped data (odd and even group sizes)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    // 6 groups of sizes 1..97, values with heavy ties to stress tie-break
    val rows = (0 until 6).flatMap { g =>
      val n = Seq(1, 2, 5, 40, 96, 97)(g)
      (0 until n).map(i => (s"g$g", (g * 1000 + i).toLong,
        rnd.nextInt(10).toLong))
    }
    val df = rows.toDF("event_type", "event_id", "v")
    val fast = graft.operators.WindowOps
      .groupLowerMedian(df, "event_type", "v", "event_id", "med")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val naive = df.withColumn("r", row_number().over(Window
        .partitionBy(col("event_type"))
        .orderBy(col("v"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .filter(col("r") === expr("(n + 1) DIV 2"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(fast === naive)
  }

  test("groupNtile: matches ntile() OVER (PARTITION BY grp) on random " +
      "grouped data including n < k groups") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(23)
    // group sizes straddle k = 4: 1, 2, 3 (n < k → bucket = rank), 4,
    // 41, 96; heavy value ties exercise the tie-break
    val rows = Seq(1, 2, 3, 4, 41, 96).zipWithIndex.flatMap { case (n, g) =>
      (0 until n).map(i => (s"g$g", (g * 1000 + i).toLong,
        rnd.nextInt(7).toLong))
    }
    val df = rows.toDF("grp", "id", "v")
    val fast = graft.operators.WindowOps
      .groupNtile(df, "grp", Seq(col("v"), col("id")), 4L, "bucket")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3))
      .toMap
    val naive = df.withColumn("bucket", ntile(4).over(Window
        .partitionBy(col("grp")).orderBy(col("v"), col("id"))))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3))
      .toMap
    assert(fast === naive)
  }

  test("correlation matrix: perfectly linear pairs hit ±1, one row per " +
      "unordered pair") {
    import spark.implicits._
    // y = 2x and z = 11 − x: r(x,y) = 1, r(x,z) = −1, r(y,z) = −1
    val df = (1 to 10).map(i => (i.toDouble, 2.0 * i, 11.0 - i))
      .toDF("x", "y", "z")
    val out = AggOps.corrMatrixOn(df, Seq("x" -> "x", "y" -> "y",
        "z" -> "z")).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(("x", "y"), ("x", "z"), ("y", "z")))
    assert(out.values.forall(_._1 === 10L))
    assert(math.abs(out(("x", "y"))._2 - 1.0) < 1e-12)
    assert(math.abs(out(("x", "z"))._2 + 1.0) < 1e-12)
    assert(math.abs(out(("y", "z"))._2 + 1.0) < 1e-12)
  }

  test("power iteration recovers a planted dominant direction as a " +
      "unit vector, exact zeros off-axis") {
    import spark.implicits._
    // points k·(0.6, 0.8, 0, 0), k = 1..20: the top component IS
    // (0.6, 0.8, 0, 0); with the all-ones seed round 1 already lands on
    // it, rounds 2-3 must hold it fixed under requantization
    val pts = (1 to 20).map { k =>
      Tuple1(Seq(0.6 * k, 0.8 * k, 0.0, 0.0))
    }.toDF("v")
    val out = graft.operators.SimOps
      .topComponentOn(spark, pts, dim = 4, rounds = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(0) - 0.6) < 2e-6, s"loading0=${out(0)}")
    assert(math.abs(out(1) - 0.8) < 2e-6, s"loading1=${out(1)}")
    assert(out(2) === 0.0 && out(3) === 0.0,
      "zero-variance dims must stay EXACTLY zero (integer accumulation)")
    val norm = math.sqrt(out.values.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5, s"norm=$norm")
  }

  test("top-2 components: deflation recovers the planted secondary axis, " +
      "orthogonal to the first") {
    import spark.implicits._
    // dominant axis (0.6, 0.8, 0, 0) at scales 1..20, secondary axis
    // (0, 0, 1, 0) at smaller scales 1..10: deflation must strip the
    // first and the second iteration must land on e₃
    val pts = ((1 to 20).map(k => Tuple1(Seq(0.6 * k, 0.8 * k, 0.0, 0.0)))
      ++ (1 to 10).map(k => Tuple1(Seq(0.0, 0.0, k.toDouble, 0.0))))
      .toDF("v")
    val out = graft.api.Graft.top2PrincipalComponents(pts, "v", dim = 4)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // each round floors loadings onto the 1e-6 grid, so k rounds sit up
    // to ~k·1e-6 below the true axis — bound accordingly
    assert(math.abs(out((1, 0)) - 0.6) < 5e-6 &&
      math.abs(out((1, 1)) - 0.8) < 5e-6)
    assert(math.abs(out((2, 2)) - 1.0) < 5e-6, s"c2=${out((2, 2))}")
    val dot12 = (0 until 4).map(i => out((1, i)) * out((2, i))).sum
    assert(math.abs(dot12) < 1e-5, s"components not orthogonal: $dot12")
    // the registered deflated component is unit-norm-ish on the fixture
    val reg = graft.operators.SimOps.pca2(spark, sf).collect()
      .map(r => r.getDouble(1))
    val nrm = math.sqrt(reg.map(x => x * x).sum)
    assert(reg.length === 64 && math.abs(nrm - 1.0) < 1e-4, s"norm=$nrm")
  }

  test("chi2: hand-computed units on a 2x2 table; perfect association " +
      "needs the zero cells to reach V = 1") {
    import spark.implicits._
    // balanced 2×2 with association: e = 15 everywhere, each cell
    // contributes floor(25/15·1e6) = 1666666 units
    val t = (Seq.fill(20)(("x", "p")) ++ Seq.fill(10)(("x", "q"))
      ++ Seq.fill(10)(("y", "p")) ++ Seq.fill(20)(("y", "q")))
      .toDF("a", "b")
    val r = graft.api.Graft.chi2(t, "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((60L, 2L, 2L, 4L * 1666666L)))
    assert(math.abs(r.getDouble(4) - 1.0 / 3) < 1e-5)
    // diagonal-only table: the two UNOBSERVED cells carry half the χ² —
    // dropping them would read V ≈ 0.707 instead of exactly 1
    val diag = (Seq.fill(30)(("x", "p")) ++ Seq.fill(30)(("y", "q")))
      .toDF("a", "b")
    val d = graft.api.Graft.chi2(diag, "a", "b").collect().head
    assert(d.getLong(3) === 60000000L && d.getDouble(4) === 1.0)
  }

  test("expectations: violations counted per rule in one scan") {
    import spark.implicits._
    val rows = Seq((1L, 10.0), (2L, -3.0), (3L, 0.0)).toDF("id", "v")
    val got = graft.api.Graft.expectations(rows, Seq(
      "v_nonneg" -> "v >= 0.0", "id_positive" -> "id > 0")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got === Map("v_nonneg" -> ((3L, 1L, false)),
      "id_positive" -> ((3L, 0L, true))))
    // empty rule list: a clear contract error, not aggs.head blowing up
    val err = intercept[IllegalArgumentException] {
      graft.api.Graft.expectations(rows, Seq.empty)
    }
    assert(err.getMessage.contains("at least one"))
  }

  test("k-anonymity: singletons are counted into the at-risk share") {
    import spark.implicits._
    // groups: (a,x)×4, (a,y)×1, (b,x)×5 → below k=5: two groups, 5 rows
    val rows = (Seq.fill(4)(("a", "x")) ++ Seq(("a", "y"))
      ++ Seq.fill(5)(("b", "x"))).toDF("q1", "q2")
    val r = graft.api.Graft.kAnonymity(rows, Seq("q1", "q2"), k = 5)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((10L, 3L, 1L, 2L, 5L, 500L)))
  }

  test("welch t: exact moments give t = 2 on a hand-built contrast") {
    import spark.implicits._
    // g1 = {2, 4}: mean 3, s²/n = 1; g2 = {1, 1, 1}: zero variance —
    // t = (3 − 1)/√1 = 2 exactly (every intermediate is IEEE-exact)
    val df = Seq(("x", 2.0), ("x", 4.0), ("y", 1.0), ("y", 1.0),
      ("y", 1.0)).toDF("g", "v")
    val r = graft.api.Graft.ttest(df, "g", "v", "x", "y").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 3L)))
    assert(r.getDouble(2) === 3.0 && r.getDouble(3) === 1.0)
    assert(r.getDouble(4) === 2.0)
  }

  test("l-diversity: homogeneous and low-l groups roll into the risk row") {
    import spark.implicits._
    // group a: sensitive {1,1,2} → l=2 (below 3, not homogeneous: 2/3);
    // group b: {1,2,3} → l=3 (safe); group c: {5}×10 → l=1, 100%
    // homogeneous. Below l=3: a+c = 13 of 16 rows → 812‰.
    val rows = (Seq(("a", 1L), ("a", 1L), ("a", 2L),
      ("b", 1L), ("b", 2L), ("b", 3L))
      ++ Seq.fill(10)(("c", 5L))).toDF("q", "sv")
    val r = graft.api.Graft.lDiversity(rows, Seq("q"), col("sv"), l = 3)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
      === ((16L, 3L, 1L, 2L, 13L, 812L, 10L)))
  }

  test("mann-whitney: disjoint samples give U = 0 and z = -sqrt(3)") {
    import spark.implicits._
    // A = {1,2,3} all below B = {4,5}: R_A = 1+2+3 → doubled 12,
    // U_A = 0, U_B = n_a·n_b = 6; no ties.
    val df = Seq(("A", 1.0, 1L), ("A", 2.0, 2L), ("A", 3.0, 3L),
      ("B", 4.0, 4L), ("B", 5.0, 5L)).toDF("g", "v", "id")
    val r = graft.api.Graft.mannWhitney(df, "g", "v", "A", "B", "id")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((3L, 2L, 12L, 0L, 0L, 12L)))
    val zExp = (0.0 / 2 - 3.0 * 2.0 / 2) /
      math.sqrt(3.0 * 2.0 / 12 * (6.0 - 0.0 / (5.0 * 4.0)))
    assert(r.getDouble(6) === zExp)
  }

  test("mann-whitney: a tie block carries half-unit average ranks") {
    import spark.implicits._
    // sorted 1, 2, 2, 3 → the tied 2s average rank 2.5; R_A = 1 + 2.5
    // (doubled 7), U_A = 0.5 (doubled 1), tie_sum = 2³−2 = 6.
    val df = Seq(("A", 1.0, 1L), ("A", 2.0, 2L),
      ("B", 2.0, 3L), ("B", 3.0, 4L)).toDF("g", "v", "id")
    val r = graft.api.Graft.mannWhitney(df, "g", "v", "A", "B", "id")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((2L, 2L, 7L, 6L, 1L, 7L)))
  }

  test("bootstrap CI: a constant column collapses the band to the mean") {
    import spark.implicits._
    // every replicate mean of a constant series is the constant, so
    // ci_lo = mean_v = ci_hi exactly (weights cancel)
    val df = (1L to 10L).map(i => (i, 2.0)).toDF("id", "v")
    val r = graft.api.Graft.bootstrapCi(df, "v", "id", bReps = 8)
      .collect().head
    assert((r.getLong(0), r.getLong(1)) === ((10L, 8L)))
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4))
      === ((2.0, 2.0, 2.0)))
  }

  test("bootstrap CI: replicate means replay the hash formula exactly") {
    import spark.implicits._
    val vals = Seq((1L, 1.0), (2L, 2.0), (3L, 4.0), (4L, 8.0))
    val bReps = 4
    val df = vals.toDF("id", "v")
    val r = graft.api.Graft.bootstrapCi(df, "v", "id", bReps = bReps)
      .collect().head
    // driver-side replay of the exact per-(row, replicate) draw
    val P = 2147483647L
    val cums = graft.operators.AggOps.poissonCums
    def w(id: Long, b: Long): Long = {
      val u = (((id + 7919) * (2 * b + 1) % P) * 1103515245L % P)
        .toDouble / P
      val k = cums.indexWhere(u < _)
      if (k < 0) 7L else k.toLong
    }
    val means = (1 to bReps).map { b =>
      val sw = vals.map { case (id, v) =>
        w(id, b) * math.floor(v * 1000).toLong }.sum
      val cw = vals.map { case (id, _) => w(id, b) }.sum
      sw.toDouble / cw.toDouble / 1000
    }
    // bReps = 4 → lo rank 1 (min), hi rank 4 (max)
    assert(r.getDouble(3) === means.min)
    assert(r.getDouble(4) === means.max)
    val meanFull = vals.map { case (_, v) =>
      math.floor(v * 1000).toLong }.sum.toDouble / vals.length / 1000
    assert(r.getDouble(2) === meanFull)
  }

  test("mann-whitney: one global tie block gives NULL z, not a throw") {
    import spark.implicits._
    // every value identical → tie correction makes the variance exactly
    // 0; before the guard this was an ANSI 0/0 DIVIDE_BY_ZERO crash.
    // Integer algebra stays exact: ranks 1..4 one block, ta=2 → r2_a=10,
    // u2_a = 10 − 2·3 = 4, tie_sum = 4³−4 = 60.
    val df = Seq(("A", 1.0, 1L), ("A", 1.0, 2L),
      ("B", 1.0, 3L), ("B", 1.0, 4L)).toDF("g", "v", "id")
    val r = graft.api.Graft.mannWhitney(df, "g", "v", "A", "B", "id")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((2L, 2L, 10L, 60L, 4L, 4L)))
    assert(r.isNullAt(6))
  }

  test("kruskal-wallis: one global tie block gives NULL correction") {
    import spark.implicits._
    // all values equal → Σ(t³−t) = n³−n, correction factor exactly 0
    // (h_value itself is 0 here; h/0 was the ANSI crash).
    val df = Seq(("a", 1.0, 1L), ("a", 1.0, 2L), ("b", 1.0, 3L))
      .toDF("g", "v", "id")
    val r = graft.api.Graft.kruskalWallis(df, "g", "v", "id")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2))
      === ((3L, 2L, 24L)))
    assert(r.getDouble(3) === 0.0)
    assert(r.isNullAt(4))
  }

  test("hill tail index: <= k positive values is a contract error") {
    import spark.implicits._
    // 3 positive values with k = 3 under-fills the k+1 frame; the old
    // behavior reported alpha from the wrong number of ln terms while
    // still labeling it k_tail = 3 — a silent wrong answer.
    val df = Seq(1.0, 2.0, 4.0).map(Tuple1(_)).toDF("v")
    val e = intercept[IllegalArgumentException] {
      graft.api.Graft.hillTailIndex(df, "v", k = 3)
    }
    assert(e.getMessage.contains("more than k=3"))
  }

  test("hill tail index: an all-equal tail gives NULL alpha, not a throw") {
    import spark.implicits._
    // every ln(v/vref) term is exactly 0 → qsum = 0; alpha is undefined
    // (a constant has no tail exponent) — previously an ANSI 0-division
    val df = Seq.fill(6)(2.0).map(Tuple1(_)).toDF("v")
    val r = graft.api.Graft.hillTailIndex(df, "v", k = 3).collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 2000L)))
    assert(r.isNullAt(2))
  }

  test("bootstrap CI: an all-zero-weight replicate is NULL, not a throw") {
    import spark.implicits._
    // single-row input: each replicate's weight sum is ONE Poisson(1)
    // draw, so any w=0 replicate hits the cw=0 guard (previously an
    // ANSI 0/0 throw). Driver-replay the deterministic hash stream to
    // know which outcome to expect.
    val P = 2147483647L
    val cums = graft.operators.AggOps.poissonCums
    def w(id: Long, b: Long): Long = {
      val u = (((id + 7919) * (2 * b + 1) % P) * 1103515245L % P)
        .toDouble / P
      val k = cums.indexWhere(u < _)
      if (k < 0) 7L else k.toLong
    }
    val bReps = 8
    val zeroes = (1 to bReps).count(b => w(1L, b.toLong) == 0L)
    assert(zeroes > 0, "fixture must contain a zero-weight replicate")
    val df = Seq((1L, 2.0)).toDF("id", "v")
    val out = graft.api.Graft.bootstrapCi(df, "v", "id", bReps = bReps)
      .collect()
    // hiRank = bReps cannot exist among the bReps − zeroes non-NULL
    // means, so the order-statistic frame is empty and the output is 0
    // rows — deterministic, mirrored by the oracle, and NOT a crash.
    assert(out.isEmpty)
  }

  test("BH-FDR: driver-side replay of the whole pipeline bit-for-bit") {
    import spark.implicits._
    // seeded random 3×3 cells, two planted shifts — the brute-force
    // cross-check pattern: replicate moments → Welch z → A-S p → theta
    // rank → step-up in plain Scala (same JVM libm, so doubles are
    // bit-equal) and compare every column of every row.
    val rng = new scala.util.Random(11)
    val rows = for {
      g1 <- Seq("a", "b", "c"); g2 <- Seq(1, 2, 3); _ <- 1 to 30
    } yield {
      val base = 50.0 + rng.nextDouble() * 10
      val shift = if (g1 == "a" && g2 == 1) 40.0
        else if (g1 == "b" && g2 == 2) -30.0 else 0.0
      (g1, g2, base + shift)
    }
    val df = rows.toDF("g1", "g2", "v")
    val got = graft.api.Graft.bhFdr(df, "g1", "g2", "v", qPerMille = 50)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7), r.getBoolean(8))).toMap
    // replay
    val cells = rows.groupBy(r => (r._1, r._2)).map { case (kk, rs) =>
      val vu = rs.map(r => math.floor(r._3 * 1000).toLong)
      kk -> ((vu.size.toLong, vu.sum, vu.map(u => u * u).sum))
    }
    val m = cells.size
    val (tn, ts1, ts2) = cells.values
      .foldLeft((0L, 0L, 0L)) { case ((a, b, c), (x, y, z)) =>
        (a + x, b + y, c + z) }
    val zByCell = cells.map { case (kk, (n, s1, s2)) =>
      val (nr, r1, r2) = (tn - n, ts1 - s1, ts2 - s2)
      val se2 = ((s2.toDouble / 1e6 - (s1.toDouble / n / 1000)
          * (s1.toDouble / 1000)) / (n - 1)) / n +
        ((r2.toDouble / 1e6 - (r1.toDouble / nr / 1000)
          * (r1.toDouble / 1000)) / (nr - 1)) / nr
      val diff = s1.toDouble / n / 1000 - r1.toDouble / nr / 1000
      kk -> (n, s1.toDouble / n / 1000,
        if (se2 <= 0) None else Some(diff / math.sqrt(se2)))
    }
    val inv = graft.operators.AggOps.invSqrt2Pi
    def pOf(z: Double): Double = {
      val t = 1 / (1 + 0.2316419 * math.abs(z))
      2 * (math.exp(-(math.abs(z) * math.abs(z)) / 2) * inv) * t *
        (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
          t * (-1.821255978 + t * 1.330274429))))
    }
    val ranked = zByCell.collect { case (kk, (_, _, Some(z))) => (kk, z) }
    def rankOf(kk: (String, Int), z: Double): Long = ranked.count {
      case (k2, z2) => math.abs(z2) > math.abs(z) ||
        (math.abs(z2) == math.abs(z) &&
          (k2._1 < kk._1 || (k2._1 == kk._1 && k2._2 <= kk._2)))
    }.toLong
    val withRank = ranked.map { case (kk, z) =>
      (kk, z, pOf(z), rankOf(kk, z)) }
    val kStar = withRank.collect {
      case (_, _, p, r) if p <= r.toDouble * 0.05 / m => r
    }.maxOption.getOrElse(0L)
    withRank.foreach { case (kk, z, p, r) =>
      val (n, meanV, zv, pv, pr, crit, sig) = got(kk)
      assert(zv === z, s"z mismatch at $kk")
      // p goes through exp(): codegen'd java.lang.Math.exp vs the
      // replay's can differ in the last ulp (the same drift the driver
      // hash tolerates vs DuckDB's libm) — z/rank/significance stay
      // bit-exact because ordering runs on |z|, never on p
      assert(math.abs(pv - p) <= 4 * Math.ulp(p), s"p mismatch at $kk")
      assert(pr === r && crit === r.toDouble * 0.05 / m)
      assert(sig === (r <= kStar), s"step-up mismatch at $kk")
      assert(n === zByCell(kk)._1 && meanV === zByCell(kk)._2)
    }
    // the two planted shifts must be the top-2 discoveries
    assert(got(("a", 1))._7 && got(("b", 2))._7)
    assert(Set(got(("a", 1))._5, got(("b", 2))._5) === Set(1L, 2L))
  }

  test("t-closeness: hand-computed EMD on a two-band fixture") {
    import spark.implicits._
    // global bands 3/3 (50/50 over n = 6); groups a (all band 0) and b
    // (all band 1) are maximally skewed, c mirrors the population.
    // Integer grid diff = cnt·n − cnt_all·ng: a → (6, −6), cums (6, 0),
    // t_units 6, t = 6/(2·6)/(2−1) = 0.5; c → (0, 0) ⇒ t = 0.
    val df = Seq(("a", 0L), ("a", 0L), ("b", 1L), ("b", 1L),
      ("c", 0L), ("c", 1L)).toDF("q", "sv")
    val out = graft.api.Graft.tCloseness(df, Seq("q"), col("sv"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(out("a") === ((2L, 2L, 0.5, true)))
    assert(out("b") === ((2L, 2L, 0.5, true)))
    assert(out("c") === ((2L, 2L, 0.0, false)))
  }

  test("t-closeness: seeded random data matches an O(groups·bands) replay") {
    import spark.implicits._
    // brute-force cross-check (the r13 close discipline): random
    // (group, band) rows; replay the integer EMD grid in plain Scala
    // and demand bit equality on every t_value
    val rng = new scala.util.Random(17)
    val rows = Seq.fill(400)((s"g${rng.nextInt(6)}", rng.nextInt(5).toLong))
    val df = rows.toDF("q", "sv")
    val got = graft.api.Graft.tCloseness(df, Seq("q"), col("sv"),
        topN = 100).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val n = rows.size.toLong
    val bands = rows.map(_._2).distinct.sorted
    val m = bands.size
    val globC = rows.groupBy(_._2).map { case (b, rs) =>
      b -> rs.size.toLong }
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val ng = rs.size.toLong
      val cnt = rs.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
      val diffs = bands.map(b =>
        cnt.getOrElse(b, 0L) * n - globC(b) * ng)
      val tUnits = diffs.scanLeft(0L)(_ + _).tail.map(math.abs).sum
      val t = tUnits.toDouble / (ng.toDouble * n.toDouble) / (m - 1)
      assert(got(g)._1 === ng)
      assert(got(g)._2 === t, s"t mismatch for group $g")
    }
  }

  test("CUPED: driver-side replay of theta and both uplifts bit-for-bit") {
    import spark.implicits._
    // seeded users with correlated pre/post metrics and a planted
    // treatment lift; replay the exact moment algebra in Scala
    val rng = new scala.util.Random(13)
    val rows = (0L until 60L).flatMap { u =>
      val base = 10.0 + rng.nextDouble() * 20
      val isA = (u % 1000) * 761 % 1000 < 500
      Seq((u, base + rng.nextDouble(), true),
        (u, base + rng.nextDouble() + (if (isA) 3.0 else 0.0), false))
    }
    val df = rows.map { case (u, v, pre) => (u, v, pre) }
      .toDF("u", "v", "pre")
    val got = graft.api.Graft.cuped(df, "u", "v", "pre").collect().head
    // replay
    val users = rows.groupBy(_._1).map { case (u, rs) =>
      val x = rs.filter(_._3).map(r => math.floor(r._2 * 1000).toLong).sum
      val y = rs.filter(!_._3).map(r => math.floor(r._2 * 1000).toLong).sum
      (u, x, y, (u % 1000) * 761 % 1000 < 500)
    }.toSeq
    val n = users.size.toLong
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxx = users.map(r => r._2 * r._2).sum
    val sxy = users.map(r => r._2 * r._3).sum
    val na = users.count(_._4).toLong; val nb = n - na
    val sxa = users.filter(_._4).map(_._2).sum
    val sya = users.filter(_._4).map(_._3).sum
    val (sxb, syb) = (sx - sxa, sy - sya)
    val theta = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val upRaw = sya.toDouble / na / 1000 - syb.toDouble / nb / 1000
    val upCuped = (sya.toDouble / na / 1000 - syb.toDouble / nb / 1000) -
      theta * (sxa.toDouble / na / 1000 - sxb.toDouble / nb / 1000)
    assert((got.getLong(0), got.getLong(1), got.getLong(2))
      === ((n, na, nb)))
    assert(got.getDouble(3) === theta)
    assert(got.getDouble(5) === upRaw)
    assert(got.getDouble(6) === upCuped)
    // the planted +3.0 lift on arm A must survive adjustment
    assert(upCuped > 1.0 && got.getLong(4) >= 0L)
  }

  test("BH-FDR: constant data gives NULL z everywhere, nothing significant") {
    import spark.implicits._
    val df = (for { g1 <- Seq("a", "b"); g2 <- Seq(1, 2); i <- 1 to 5 }
      yield (g1, g2, 7.0)).toDF("g1", "g2", "v")
    val out = graft.api.Graft.bhFdr(df, "g1", "g2", "v").collect()
    assert(out.length === 4)
    assert(out.forall(r => r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6)
      && !r.getBoolean(8)))
  }

  test("max drawdown: hand-traced peak-to-trough on a signed series") {
    import spark.implicits._
    val df = Seq(("u", 1L, 5L), ("u", 2L, -3L), ("u", 3L, 1L),
      ("u", 4L, -4L), ("u", 5L, 10L), ("v", 1L, 2L), ("v", 2L, 3L))
      .toDF("g", "t", "dv")
    val out = graft.api.Graft.maxDrawdown(df, "g", Seq("t"), "dv")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // u: cum 5,2,3,-1,9; peak 5,5,5,5,9; dd 0,3,2,6,0
    assert(out("u") === ((5L, 6L, 9L)))
    // v only climbs: zero drawdown
    assert(out("v") === ((2L, 0L, 5L)))
  }

  test("mutual info: ln2 when X determines Y, exactly 0 when independent") {
    import spark.implicits._
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val r1 = graft.api.Graft.mutualInfo(dep, "x", "y").collect().head
    assert((r1.getLong(0), r1.getLong(1)) === ((4L, 2L)))
    assert(r1.getDouble(2) === 693147.0 * 4 / 4 / 1000000) // ⌊ln2·1e6⌋
    val ind = Seq(("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"))
      .toDF("x", "y")
    val r2 = graft.api.Graft.mutualInfo(ind, "x", "y").collect().head
    assert(r2.getDouble(2) === 0.0)
  }

  test("hill tail index: exact replay of the quantized ln sum") {
    import spark.implicits._
    val vals = Seq(8.0, 4.0, 2.0, 1.0, 0.5, 0.25)
    val df = vals.map(Tuple1(_)).toDF("v")
    val r = graft.api.Graft.hillTailIndex(df, "v", k = 3)
      .collect().head
    // driver replay: top-4 milli values, ref = min, micro-quantized lns
    val vus = vals.map(v => math.floor(v * 1000).toLong).sorted.reverse
      .take(4)
    val vref = vus.min
    val qsum = vus.map(vu =>
      math.floor(math.log(vu.toDouble / vref.toDouble) * 1e6).toLong).sum
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === vref)
    assert(r.getDouble(2) === 3.0 / (qsum.toDouble / 1000000))
  }

  test("trimmed mean: hand-computed asymmetric tails, k = 1") {
    import spark.implicits._
    val vals = Seq(0.0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 30, 1000.0)
    val df = vals.map(v => Tuple1(v)).toDF("v")
    val r = graft.api.Graft.trimmedMean(df, "v", trimPerMille = 100)
      .collect().head
    assert((r.getLong(0), r.getLong(1)) === ((12L, 1L)))
    assert(r.getDouble(2) === 1084000.0 / 12 / 1000) // same IEEE chain
    assert(r.getDouble(3) === 8.4) // mid ranks 2..11: 84 / 10
    assert(r.getDouble(4) === 116.0 / 12) // (84 + 2 + 30) / 12
  }

  test("trimmed mean: ties at the cut split exactly") {
    import spark.implicits._
    val df = Seq(1.0, 1, 1, 5, 6, 7, 8, 9, 9, 9).map(Tuple1(_)).toDF("v")
    val r = graft.api.Graft.trimmedMean(df, "v", trimPerMille = 100)
      .collect().head
    // k=1: one of the three 1s and one of the three 9s drop
    assert(r.getLong(1) === 1L)
    assert(r.getDouble(3) === 46.0 / 8)
    assert(r.getDouble(4) === 5.6) // (46 + 1 + 9) / 10
  }

  test("trimmed mean: equals the sort-based definition on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // duplicate-heavy values stress the tie-splitting identity
    val vals = (1 to 257).map(_ => (rnd.nextInt(30) + 1) / 2.0)
    val r = graft.api.Graft.trimmedMean(vals.map(Tuple1(_)).toDF("v"),
      "v", trimPerMille = 150).collect().head
    val vus = vals.map(v => math.floor(v * 1000).toLong).sorted
    val n = vus.length
    val k = (150L * n / 1000).toInt
    assert(r.getLong(1) === k.toLong)
    val mid = vus.slice(k, n - k)
    assert(r.getDouble(3) ===
      mid.sum.toDouble / mid.length / 1000, "trimmed")
    val wins = vus.take(k).map(_ => vus(k)) ++ mid ++
      vus.takeRight(k).map(_ => vus(n - k - 1))
    assert(r.getDouble(4) === wins.sum.toDouble / n / 1000, "winsorized")
  }

  test("trimmed mean: k = 0 collapses all three means") {
    import spark.implicits._
    val df = Seq(1.0, 2, 3, 4, 100).map(Tuple1(_)).toDF("v")
    val r = graft.api.Graft.trimmedMean(df, "v", trimPerMille = 100)
      .collect().head
    assert(r.getLong(1) === 0L)
    assert(r.getDouble(2) === 22.0 && r.getDouble(3) === 22.0 &&
      r.getDouble(4) === 22.0)
  }

  test("ab bootstrap: paired replicate diffs replay the hash exactly") {
    import spark.implicits._
    val rows = Seq((1L, "A", 2.0), (2L, "A", 4.0), (3L, "A", 6.0),
      (4L, "B", 1.0), (5L, "B", 3.0))
    val bReps = 4
    val df = rows.toDF("id", "g", "v")
    val r = graft.api.Graft.abBootstrap(df, "g", "v", "id", "A", "B",
      bReps = bReps).collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 2L)))
    assert(r.getDouble(2) === 12000.0 / 3 / 1000)
    assert(r.getDouble(3) === 4000.0 / 2 / 1000)
    assert(r.getDouble(4) === 12000.0 / 3 / 1000 - 4000.0 / 2 / 1000)
    val P = 2147483647L
    val cums = graft.operators.AggOps.poissonCums
    def w(id: Long, b: Long): Long = {
      val u = (((id + 7919) * (2 * b + 1) % P) * 1103515245L % P)
        .toDouble / P
      val k = cums.indexWhere(u < _)
      if (k < 0) 7L else k.toLong
    }
    def gm(ids: Seq[(Long, Double)], b: Long): Double = {
      val sw = ids.map { case (id, v) =>
        w(id, b) * math.floor(v * 1000).toLong }.sum
      val cw = ids.map { case (id, _) => w(id, b) }.sum
      sw.toDouble / cw.toDouble / 1000
    }
    val a = rows.filter(_._2 == "A").map(t => (t._1, t._3))
    val bb = rows.filter(_._2 == "B").map(t => (t._1, t._3))
    val diffs = (1 to bReps).map(b => gm(a, b) - gm(bb, b))
    assert(r.getDouble(5) === diffs.min) // bReps=4 → lo rank 1
    assert(r.getDouble(6) === diffs.max)
  }

  test("spearman: a perfect monotone pair gives rho = 1") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 10.0), (2L, 2.0, 20.0), (3L, 3.0, 90.0))
      .toDF("id", "x", "y")
    val r = graft.api.Graft.spearman(df, "x", "y", "id").collect().head
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(6) === 1.0)
  }

  test("spearman: an x tie block lands on the hand-computed rho") {
    import spark.implicits._
    // x = {1,1,2} → doubled ranks {3,3,6}; y = {1,2,3} → {2,4,6};
    // moments: sx=12 sy=12 sxx=54 syy=56 sxy=54 →
    // rho = 18/sqrt(18·24) = √3/2
    val df = Seq((1L, 1.0, 1.0), (2L, 1.0, 2.0), (3L, 2.0, 3.0))
      .toDF("id", "x", "y")
    val r = graft.api.Graft.spearman(df, "x", "y", "id").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) === ((12L, 12L, 54L, 56L, 54L)))
    assert(r.getDouble(6) === 18.0 / math.sqrt(18.0 * 24.0))
  }

  test("kruskal-wallis: two clean groups give H = 2.4 via exact rank sums") {
    import spark.implicits._
    // A = {1,2}, B = {3,4}: ranks 1..4, R_A = 3, R_B = 7 → doubled 6/14;
    // Q = 9/2 + 49/2 = 29, H = 12·29/20 − 15 = 2.4, no ties
    val df = Seq(("A", 1.0, 1L), ("A", 2.0, 2L),
      ("B", 3.0, 3L), ("B", 4.0, 4L)).toDF("g", "v", "id")
    val r = graft.api.Graft.kruskalWallis(df, "g", "v", "id")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 2L, 0L)))
    val q = (6.0 / 2) * (6.0 / 2) / 2.0 + (14.0 / 2) * (14.0 / 2) / 2.0
    val hExp = 12 * q / (4.0 * 5.0) - 3 * 5.0
    assert(r.getDouble(3) === hExp)
    assert(r.getDouble(4) === hExp) // tie_sum 0 → correction is /1
  }

  test("kruskal-wallis: a tie block feeds the correction term") {
    import spark.implicits._
    // A = {1,1}, B = {2}: tie block doubled rank 3 → r2_A = 6, r2_B = 6;
    // Q = 4.5 + 9 = 13.5, H = 12·13.5/12 − 12 = 1.5; tie_sum = 6 →
    // H / (1 − 6/24) = 2.0
    val df = Seq(("A", 1.0, 1L), ("A", 1.0, 2L), ("B", 2.0, 3L))
      .toDF("g", "v", "id")
    val r = graft.api.Graft.kruskalWallis(df, "g", "v", "id")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 6L)))
    assert(r.getDouble(3) === 1.5)
    assert(r.getDouble(4) === 2.0)
  }

  test("rank moments: spearman and kruskal refuse loudly past the exactness bound") {
    import spark.implicits._
    // the real bound (4n³ ≤ 2⁶³ ⇒ n ≈ 1.3e6) is enforced by the same
    // guard column; drive the code path with a tiny maxRows so the
    // refusal is observed without ranking a megarow frame
    assert(graft.operators.AggOps.MaxExactRankRows === 1300000L)
    val df = (1 to 8).map(i => (i.toLong, i.toDouble, (i * 3 % 7).toDouble))
      .toDF("id", "x", "y")
    val eS = intercept[Exception] {
      graft.operators.AggOps.spearmanOn(df, "x", "y", "id", maxRows = 5L)
        .collect()
    }
    assert(eS.getMessage.contains("rank-moment exactness bound"))
    val gdf = (1 to 8).map(i => (if (i % 2 == 0) "A" else "B",
      i.toDouble, i.toLong)).toDF("g", "v", "id")
    val eK = intercept[Exception] {
      graft.operators.AggOps.kruskalWallisOn(gdf, "g", "v", "id",
        maxRows = 5L).collect()
    }
    assert(eK.getMessage.contains("rank-moment exactness bound"))
    // below the bound the same frames compute (guard is transparent)
    assert(graft.operators.AggOps.spearmanOn(df, "x", "y", "id", maxRows = 8L)
      .collect().head.getLong(0) === 8L)
    assert(graft.operators.AggOps.kruskalWallisOn(gdf, "g", "v", "id",
      maxRows = 8L).collect().head.getLong(0) === 8L)
  }

  test("spearman decimal lift: agrees with the BIGINT path below the " +
      "bound and runs exactly past it where that path refuses") {
    import spark.implicits._
    // bit-for-bit agreement on the tie fixture (same ranks, same rho
    // expression — only the aggregation buffer differs)
    val df = Seq((1L, 1.0, 1.0), (2L, 1.0, 2.0), (3L, 2.0, 3.0))
      .toDF("id", "x", "y")
    val a = graft.api.Graft.spearman(df, "x", "y", "id").collect().head
    val b = graft.api.Graft.spearmanLifted(df, "x", "y", "id")
      .collect().head
    assert(b.getLong(0) === a.getLong(0))
    (1 to 5).foreach(i =>
      assert(b.getDecimal(i).longValueExact === a.getLong(i)))
    assert(b.getDouble(6) === a.getDouble(6))
    // past the bound: 1.4M perfectly monotone rows — the BIGINT path
    // refuses, the lifted path computes rho = 1 (num and both variance
    // factors are the same decimal, so rho = d/sqrt(d*d) up to one ulp)
    val big = spark.range(1400000L).selectExpr("id",
      "cast(id as double) as x", "cast(id * 2 as double) as y")
    val eS = intercept[Exception] {
      graft.operators.AggOps.spearmanOn(big, "x", "y", "id").collect()
    }
    assert(eS.getMessage.contains("rank-moment exactness bound"))
    val r = graft.api.Graft.spearmanLifted(big, "x", "y", "id")
      .collect().head
    assert(r.getLong(0) === 1400000L)
    assert(r.getLong(0) > graft.operators.AggOps.MaxExactRankRows)
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-12)
  }

  test("autocorr: alternating hourly counts give acf(1) = -0.75, acf(2) = 0.5") {
    import spark.implicits._
    // hourly counts [2,1,2,1]: c = 4x−6 = [2,−2,2,−2], den = 16;
    // lag1 num = −12, lag2 num = 8
    val ts = Seq("00:00", "00:30", "01:00", "02:00", "02:30", "03:00")
      .map(t => s"2024-05-01 $t:00")
    val df = ts.toDF("raw").select(to_timestamp(col("raw")).as("ts"))
    val out = graft.api.Graft.autocorr(df, Seq(1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(out === Array((1L, -12L, 16L, -0.75), (2L, 8L, 16L, 0.5)))
  }

  test("autocorr: an empty hour gap-fills to zero before centering") {
    import spark.implicits._
    // counts [2,0,2] (hour 1 absent): c = 3x−4 = [2,−4,2], den = 24,
    // lag1 num = −16 → acf = −2/3
    val ts = Seq("00:00", "00:30", "02:00", "02:30")
      .map(t => s"2024-05-01 $t:00")
    val df = ts.toDF("raw").select(to_timestamp(col("raw")).as("ts"))
    val r = graft.api.Graft.autocorr(df, Seq(1)).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((3L, 2L, -16L, 24L)))
    assert(r.getDouble(5) === -16.0 / 24.0)
  }

  test("centroid confusion: separable labels classify onto the diagonal") {
    import spark.implicits._
    val e = Seq((1L, 1, Seq(1.0, 0.0)), (2L, 1, Seq(0.9, 0.1)),
      (3L, 2, Seq(0.0, 1.0)), (4L, 2, Seq(0.1, 0.9)))
      .toDF("vid", "lbl", "v")
    val got = graft.api.Graft.centroidConfusion(e, "vid", "lbl", "v")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq === Seq((1, 1, 2L), (2, 2, 2L)))
  }

  test("lexical df-cap: a corpus-wide hot term changes nothing vs " +
      "stripping it, and its postings are never candidates") {
    import spark.implicits._
    // 40 docs all share stop-word "the"; discriminative terms are rare.
    // Query docs 0..3 each share exactly one rare term with some others.
    // rare terms have df = 4 = exactly 10% of 40 (the cap boundary is
    // inclusive: 4·1000 ≤ 40·100); the hot term's df = 40 is capped out
    val docs = (0 until 40).map { i =>
      val rare = s"tok${i % 10}"
      (i.toLong, s"the $rare filler$i")
    }.toDF("doc_id", "text")
    val capped = SimOps.lexicalRankOn(spark, docs, dfCapPermille = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val stripped = SimOps.lexicalRankOn(spark,
        docs.withColumn("text", regexp_replace(col("text"), "the ", "")),
        dfCapPermille = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(capped === stripped)
    assert(capped.nonEmpty)
    // every candidate shares the query's RARE term (df 4 of 40), never
    // the hot one: doc_id ≡ qid (mod 10)
    assert(capped.forall { case (qid, did, _) => did % 10 == qid % 10 })
  }
}
