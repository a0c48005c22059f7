package graft.operators

import graft.{OpFamily, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The arbitrary-code reduce surface (SURVEY.md §2.10): what the reference
  * exposes as "write any Python reducer" maps to (a) a typed `Aggregator`
  * registered as a UDAF — mergeable partial state, so Catalyst still plans
  * map-side partial aggregation — and (b) `groupByKey.flatMapGroups` for
  * reducers that need the whole ordered value stream.
  *
  * Scale notes: the Aggregator ships one small buffer per (key, partition)
  * through the shuffle, exactly like a built-in agg. flatMapGroups shuffles
  * the group's rows — the honest cost of an arbitrary stateful reducer —
  * and is the fallback when no algebraic decomposition exists; the streak
  * example sorts in memory per group (bounded here by events-per-user).
  */
object ReduceOps extends OpFamily {

  /** Exact weighted mean: BigDecimal partial sums (order-insensitive),
    * merged associatively — deterministic across any partitioning.
    */
  private class WeightedMean
    extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
    def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    def reduce(b: (BigDecimal, BigDecimal), in: (Double, Double)) = {
      val (x, w) = in
      (b._1 + BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(w).setScale(4, BigDecimal.RoundingMode.HALF_UP),
        b._2 + BigDecimal(w).setScale(4, BigDecimal.RoundingMode.HALF_UP))
    }
    def merge(a: (BigDecimal, BigDecimal), b: (BigDecimal, BigDecimal)) =
      (a._1 + b._1, a._2 + b._2)
    // final division in IEEE double (exact decimal sums → double → divide)
    // so the value is bit-identical to the oracle's CAST(...)/CAST(...)
    def finish(r: (BigDecimal, BigDecimal)): Double =
      r._1.toDouble / r._2.toDouble
    def bufferEncoder = Encoders.product[(BigDecimal, BigDecimal)]
    def outputEncoder = Encoders.scalaDouble
  }

  /** Price per returnflag weighted by quantity, via the custom UDAF. */
  def weightedAvg(s: SparkSession, d: String): DataFrame = {
    val wmean = udaf(new WeightedMean)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(wmean(col("l_extendedprice"), col("l_quantity"))
        .as("weighted_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Longest run of consecutive same-type events per user — an arbitrary
    * ordered-stream reducer via groupByKey.flatMapGroups (the MR "secondary
    * sort + stateful reducer" idiom, typed).
    */
  def longestStreak(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        // order by event_id (event ids are assigned in ts order)
        val evs = it.toArray.sortBy(_._2)
        var bestType = ""; var bestLen = 0
        var curType = ""; var curLen = 0
        evs.foreach { case (_, _, t) =>
          if (t == curType) curLen += 1 else { curType = t; curLen = 1 }
          if (curLen > bestLen || (curLen == bestLen && t < bestType)) {
            bestLen = curLen; bestType = curType
          }
        }
        Iterator((uid, bestType, bestLen))
      }
      .toDF("user_id", "streak_type", "streak_len")
      .orderBy(col("user_id"))
  }

  /** The same reducer expressed declaratively (gaps-and-islands) — proof
    * that the typed path and the SQL path agree, and the plan Catalyst can
    * actually optimize. Kept as the oracle twin for [[longestStreak]].
    */

  /** The reference's literal entry point, gate-checked: wordcount written
    * as `mapreduce(docs, mapper, reducer, combiner)` through the
    * [[graft.api.MapReduce]] shim (arbitrary user lambdas, map-side
    * combine, groupByKey shuffle), then top-20 — the exact program a
    * reference user would port first, verified against the same oracle
    * as the declarative [[AggOps.wordcount]].
    */
  def mrWordcount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select(col("text")).as[String]
    graft.api.MapReduce.mapReduce[String, String, Long, (String, Long)](
      docs,
      mapper = line => line.split(" ").iterator
        .filter(_.nonEmpty).map(_ -> 1L),
      reducer = (word, counts) => Iterator(word -> counts.sum),
      combiner = Some((_, counts) => Iterator(counts.sum)))
      .toDF("word", "n")
      .orderBy(desc("n"), col("word"))
      .limit(20)
  }

  /** Reduce-side join written as `cogroup(clicks, purchases)` through the
    * [[graft.api.MapReduce.coGroup]] shim — the second program a reference
    * user ports (multi-input reduce with both tagged value streams in one
    * reducer). Per user: click/purchase counts and the smallest purchase
    * id (min — order-free, so the unordered iterators stay deterministic);
    * users with only one side present still appear (full-outer contract),
    * with −1 marking "no purchase".
    */
  def cogroupClickPurchase(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as[Long], col("event_id").as[Long])
      .as[(Long, Long)]
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as[Long], col("event_id").as[Long])
      .as[(Long, Long)]
    graft.api.MapReduce.coGroup[(Long, Long), (Long, Long), Long,
      (Long, Long, Long, Long)](
      clicks, purchases, _._1, _._1,
      (user, cs, ps) => {
        var nC = 0L
        cs.foreach(_ => nC += 1)
        var nP = 0L
        var firstP = Long.MaxValue
        ps.foreach { p => nP += 1; if (p._2 < firstP) firstP = p._2 }
        Iterator((user, nC, nP, if (nP == 0) -1L else firstP))
      })
      .toDF("user_id", "n_clicks", "n_purchases", "first_purchase_id")
      .orderBy(col("user_id"))
  }

  /** Per-group quantile estimates via the mergeable KLL/MRL sketch UDAF
    * ([[graft.functions.KllSketch]]): p50/p90/p99 of extendedprice per
    * returnflag. The scale story vs the exact paths: percentile() holds
    * every group value in memory, [[graft.api.Graft.exactQuantiles]]
    * pays a total-order sort; the sketch ships one O(k·log(n/k)) buffer
    * per (key, partition) through the shuffle with map-side partial
    * aggregation — the only shape that survives a 100 TB group.
    * Sketch estimates are partition-order-dependent (rows-only query);
    * PropertySpec pins the ≤5%-rank-error and merge-law guarantees.
    */
  def kllQuantiles(s: SparkSession, d: String): DataFrame = {
    val kll = udaf(new graft.functions.KllSketch(512,
      Array(0.5, 0.9, 0.99)))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(kll(col("l_extendedprice")).as("qs"))
      .select(col("l_returnflag"), col("qs")(0).as("p50_est"),
        col("qs")(1).as("p90_est"), col("qs")(2).as("p99_est"))
      .orderBy(col("l_returnflag"))
  }

  /** KLL ACCURACY REPORT — the measured-instrument pattern
    * (sim_recall_report / dedup_recall_report precedent) for the sketch
    * family: per (returnflag, percentile), the KLL estimate next to the
    * EXACT order statistic and the relative error in permille. This is
    * the number a rollout tunes k against — "is k=512 enough for p99 on
    * this distribution" is an empirical question, and this query is its
    * answer. The exact side pays one per-group sort (the instrument's
    * cost — run it on a sample at 100 TB; the sketch side is the
    * production path). Sketch estimates are partition-order-dependent →
    * rows-only query; the error BOUND is pinned in scalatest.
    */
  def kllAccuracy(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val est = kllQuantiles(s, d)
      .selectExpr("l_returnflag",
        """stack(3, CAST(50 AS BIGINT), p50_est,
                    CAST(90 AS BIGINT), p90_est,
                    CAST(99 AS BIGINT), p99_est) AS (pct, est_v)""")
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"))
    val base = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("r", row_number().over(w).cast("long"))
    val counts = base.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    val exact = base.join(broadcast(counts), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("r"), col("n"),
        col("l_extendedprice").as("exact_v"))
      .selectExpr("l_returnflag", "exact_v",
        """CASE WHEN r = (n * 50 + 99) DIV 100 THEN CAST(50 AS BIGINT)
                WHEN r = (n * 90 + 99) DIV 100 THEN CAST(90 AS BIGINT)
                WHEN r = (n * 99 + 99) DIV 100 THEN CAST(99 AS BIGINT)
           END AS pct""")
      .filter(col("pct").isNotNull)
    est.join(exact, Seq("l_returnflag", "pct"))
      .withColumn("err_permille",
        floor(abs(col("est_v") - col("exact_v")) * 1000 / col("exact_v"))
          .cast("long"))
      .select(col("l_returnflag"), col("pct"), col("est_v"),
        col("exact_v"), col("err_permille"))
      .orderBy(col("l_returnflag"), col("pct"))
  }

  /** RESERVOIR SAMPLE PER GROUP via [[graft.functions.ReservoirK]] —
    * the classic MR uniform-sample-per-key idiom as an ASSOCIATIVE
    * typed Aggregator: k = 5 lineitems per returnflag, priority
    * h = (((id + seed) mod P)·A + B) mod P with the fixed
    * (A, B, P) = (1103515245, 12345, 2³¹−1) affine family and
    * id = 8·orderkey + linenumber (unique: linenumber ∈ 1..7). The
    * same affine hash replays in the oracle as a window bottom-k —
    * identical rows — but the WINDOW sorts each whole group where the
    * Aggregator ships one k-sized buffer per (group, partition): the
    * map-side-combine shape that survives 10¹⁰-row groups.
    */
  def reservoirSample(s: SparkSession, d: String): DataFrame =
    reservoirOn(Tables.lineitem(s, d), Seq("l_returnflag"),
      col("l_orderkey").cast("long") * 8L + col("l_linenumber"),
      k = 5, seed = 0L)
      .orderBy(col("l_returnflag"), col("h"), col("id"))

  /** Affine-priority constants shared with the oracle SQL: the classic
    * LCG multiplier mod the Mersenne prime 2³¹−1. The multiplier must be
    * LARGE — with a small A the map id → (id·A + B) mod P is MONOTONE
    * until id ≈ P/A and "bottom-k" degenerates to "k smallest ids" (the
    * first draft's A = 10⁶+3 did exactly that; caught by the golden
    * spec). A ≈ 1.1·10⁹ wraps from id = 2 on. Intermediate products
    * stay ≤ (P−1)·A < 2⁶² so 64-bit arithmetic never wraps in either
    * engine.
    */
  private val ResA = 1103515245L
  private val ResB = 12345L
  private val ResP = 2147483647L

  /** The generic core behind [[reservoirSample]] and
    * [[graft.api.Graft.reservoirSample]]: deterministic uniform k-sample
    * per group of any (unique) long id expression. Returns
    * (groupCols..., h, id) — the sampled ids with their priorities.
    */
  private[graft] def reservoirOn(df: DataFrame, groupCols: Seq[String],
      id: org.apache.spark.sql.Column, k: Int, seed: Long): DataFrame = {
    // internal working names are __-prefixed so a caller's group column
    // legitimately named "id" or "h" cannot collide mid-plan; the
    // OUTPUT columns keep the documented (h, id) names
    require(!groupCols.contains("h") && !groupCols.contains("id"),
      "reservoirSample: group columns may not be named 'h' or 'id' " +
        "(reserved for the output sample columns)")
    val res = udaf(new graft.functions.ReservoirK(k))
    df.select(groupCols.map(col) :+ id.cast("long").as("__res_id"): _*)
      .withColumn("__res_h",
        (((col("__res_id") + lit(seed)) % ResP) * ResA + ResB) % ResP)
      .groupBy(groupCols.map(col): _*)
      .agg(res(col("__res_h"), col("__res_id")).as("__res_sample"))
      .select(groupCols.map(col) :+ explode(col("__res_sample")).as("x"): _*)
      .select(groupCols.map(col) :+ col("x._1").as("h")
        :+ col("x._2").as("id"): _*)
  }

  val queries = Map(
    "reduce_kll_quantiles" -> (kllQuantiles _),
    "reduce_kll_accuracy" -> (kllAccuracy _),
    "reduce_reservoir_sample" -> (reservoirSample _),
    "reduce_weighted_avg" -> (weightedAvg _),
    "reduce_mr_wordcount" -> (mrWordcount _),
    "reduce_cogroup" -> (cogroupClickPurchase _),
    "reduce_longest_streak" -> (longestStreak _))

  val oracle = Map(
    "reduce_mr_wordcount" ->
      """SELECT word, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         WHERE word <> '' GROUP BY word ORDER BY n DESC, word LIMIT 20""",
    "reduce_cogroup" ->
      """SELECT user_id,
           CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
             AS n_clicks,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
             AS BIGINT) AS n_purchases,
           CAST(coalesce(min(CASE WHEN event_type = 'purchase'
             THEN event_id END), -1) AS BIGINT) AS first_purchase_id
         FROM events WHERE event_type IN ('click', 'purchase')
         GROUP BY user_id ORDER BY user_id""",
    "reduce_reservoir_sample" ->
      """WITH t AS (SELECT l_returnflag,
           CAST(l_orderkey AS BIGINT) * 8 + l_linenumber AS id
         FROM lineitem),
         p AS (SELECT l_returnflag, id,
           ((id % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
         FROM t)
         SELECT l_returnflag, h, id FROM (
           SELECT l_returnflag, h, id,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY h, id) AS rn
           FROM p) WHERE rn <= 5
         ORDER BY l_returnflag, h, id""",
    "reduce_weighted_avg" ->
      """SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    CAST(l_quantity AS DECIMAL(18,4)))
                / SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS weighted_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "reduce_longest_streak" ->
      """WITH runs AS (
           SELECT user_id, event_type,
             count(*) AS run_len
           FROM (
             SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id)
                 - row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY event_id) AS grp
             FROM events)
           GROUP BY user_id, event_type, grp)
         SELECT user_id, event_type AS streak_type, run_len AS streak_len
         FROM (SELECT user_id, event_type, run_len,
             row_number() OVER (PARTITION BY user_id
               ORDER BY run_len DESC, event_type) AS rn
           FROM runs)
         WHERE rn = 1 ORDER BY user_id""")
}
