package graft.operators

import graft.{OpFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sort / top-k / windowed analytics (SURVEY.md §2.6 / MRDP ch.3–4).
  *
  * In the reference, total-order sort needs a sampling partitioner job,
  * top-k needs per-mapper heaps + a single reducer, and secondary sort needs
  * composite keys — all hand-built. Here each is one declarative plan:
  * `orderBy` range-partitions by sampling (the same algorithm, built in),
  * `orderBy.limit(k)` plans TakeOrderedAndProject (per-partition heap +
  * driver merge), and window functions give ordered-per-key computation
  * after a single shuffle on the partition key.
  *
  * Scale notes: every window here partitions by a key (no global
  * unpartitioned window, which would serialize on one task at 100 TB);
  * top-k-per-group runs through Spark's WindowGroupLimit pushdown, so the
  * rank filter prunes inside the sort instead of materializing full ranks.
  * Running sums accumulate in DECIMAL(18,4) so the hash-compare against the
  * oracle cannot drift on floating-point summation.
  */
object WindowOps extends OpFamily {
  private val dec = DecimalType(18, 4)

  /** Top-3 orders by price per order status (WindowGroupLimit path). */
  def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderstatus"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderstatus"), col("rn"))
  }

  /** rank vs dense_rank on ties: parts by size within brand. */
  def rankDense(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(desc("p_size"))
    Tables.part(s, d)
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      // (rank-1)/(n-1) and rows≤current/n are exact small-int divisions —
      // bit-identical across engines, so safe in a hash-compared query
      .withColumn("prk", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .filter(col("rk") <= 5)
      .select(col("p_brand"), col("p_partkey"), col("p_size"), col("rk"),
        col("drk"), col("prk"), col("cd"))
      .orderBy(col("p_brand"), desc("p_size"), col("p_partkey"))
  }

  /** EXACT median order value per customer segment — the per-group order
    * statistic (low-median: rank ⌈n/2⌉ under a total order with the order
    * key as tiebreaker), the groupwise sibling of the global
    * [[exact quantiles|graft.api.Graft.exactQuantiles]]. One partitioned
    * row_number + one bounded count join — both shuffles on the group
    * key, skew-immune (map-side partials for the count; the window
    * partitions by segment, whose cardinality bounds are the blocking
    * contract). Exact and engine-replayable where percentile_approx is
    * neither.
    */
  def groupMedian(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val o = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
    val n = o.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    o.withColumn("rn", row_number().over(w))
      .join(n, Seq("c_mktsegment"))
      .filter(col("rn") === ceil(col("n") / lit(2.0)).cast("long"))
      .select(col("c_mktsegment"), col("n"),
        col("o_totalprice").as("median_price"),
        col("o_orderkey").as("median_orderkey"))
      .orderBy(col("c_mktsegment"))
  }

  /** EXACT per-group quantiles (p25/50/75/95): the value at rank
    * ⌈p·n/100⌉ within each segment under a total order — the general form
    * of [[groupMedian]], matching [[graft.api.Graft.exactQuantiles]]'s
    * rank convention per group instead of globally. The 4-row-per-group
    * target table is built from the bounded group counts and broadcast;
    * one partitioned row_number does the selection. Exact and
    * engine-replayable where percentile_approx is neither; p·n/100 is an
    * exact small-int product under one correctly-rounded division, so
    * the ⌈·⌉ boundary cannot disagree between engines.
    */
  def groupQuantiles(s: SparkSession, d: String): DataFrame = {
    val pcts = Seq(25, 50, 75, 95)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val o = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
    val targets = o.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .select(col("c_mktsegment").as("seg"),
        explode(array(pcts.map(lit): _*)).as("pct"), col("n"))
      .select(col("seg"), col("pct"),
        ceil(col("pct") * col("n") / lit(100.0)).cast("long").as("r"))
    o.withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(targets),
        col("c_mktsegment") === col("seg") && col("rn") === col("r"))
      .select(col("c_mktsegment"), col("pct"), col("r").as("pos"),
        col("o_totalprice").as("value"))
      .orderBy(col("c_mktsegment"), col("pct"))
  }

  /** Per-user value delta between consecutive events (lag). */
  def lagDelta(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("value"),
        (col("value") - col("prev_value")).as("delta"),
        col("next_value"))
      .orderBy(col("event_id"))
  }

  /** Running (cumulative) order total per customer, decimal-exact. */
  def runningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 300)
      .withColumn("running_total",
        sum(col("o_totalprice").cast(dec)).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("running_total"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** 7-row moving average of event value per type, decimal-exact. */
  def movingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-6, 0)
    Tables.events(s, d)
      .withColumn("mov_avg",
        (sum(col("value").cast(dec)).over(w).cast("double") /
          count(lit(1)).over(w)))
      .select(col("event_id"), col("event_type"), col("value"), col("mov_avg"))
      .orderBy(col("event_id"))
  }

  /** Exact global rank without a global sort: range-partition on the sort
    * key, count rows per partition (bounded driver collect — one row per
    * partition, same order of cost as the range sampler itself), and add
    * each partition's cumulative offset to a per-partition row_number.
    * Every window partitions by `pid`, so the sort parallelizes; the rank
    * is still EXACT. The input is localCheckpoint'd because it feeds two
    * jobs (offset counts + ranking) — without materialization the range
    * partitioner could resample between them and the offsets would
    * describe a different partitioning.
    *
    * Returns (input + long column "r", total row count). The sort must be
    * a total order (include a unique tiebreaker column).
    */
  private[graft] def withExactGlobalRank(df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column]): (DataFrame, Long) = {
    val base = df.repartitionByRange(sortCols: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val perPart = base.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = perPart.map(_._1)
      .zip(perPart.map(_._2).scanLeft(0L)(_ + _)).toMap
    val n = perPart.map(_._2).sum
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("pid") === pid, lit(off)).otherwise(acc)
    }
    val w = Window.partitionBy(col("pid")).orderBy(sortCols: _*)
    (base.withColumn("r", row_number().over(w).cast("long") + offCol)
      .drop("pid"), n)
  }

  /** Exact EXCLUSIVE prefix sum of `valueCol` in `sortCols` order without
    * a single-task global window — [[withExactGlobalRank]]'s sibling for
    * cumulative WEIGHT instead of row count: range-partition on the sort
    * key, collect the bounded per-partition sums (one row per partition),
    * and add each partition's cumulative offset to a per-partition
    * running sum. Returns the input plus long column `out` = Σ value over
    * all STRICTLY-preceding rows. The sort must be a total order; the
    * input is localCheckpoint'd for the same two-jobs-one-partitioning
    * reason as the rank variant. Feeds the value-level rank algebra
    * (r20): per-distinct-value tie blocks are [cum+1, cum+t], so rank
    * consumers that only need BLOCK ranks (spearman, kruskal) never
    * range-sort full rows — only the distinct-value table.
    */
  private[graft] def withExactPrefixSum(df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column],
      valueCol: org.apache.spark.sql.Column, out: String): DataFrame = {
    val base = df.repartitionByRange(sortCols: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val perPart = base.groupBy(col("pid"))
      .agg(sum(valueCol).as("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = perPart.map(_._1)
      .zip(perPart.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("pid") === pid, lit(off)).otherwise(acc)
    }
    val w = Window.partitionBy(col("pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.withColumn(out,
        coalesce(sum(valueCol).over(w), lit(0L)) + offCol)
      .drop("pid")
  }

  /** Exact PER-GROUP lower median without a per-group window — the
    * scale-safe sibling of [[withExactGlobalRank]] for grouped order
    * statistics. A `row_number() OVER (PARTITION BY grp)` plan caps
    * parallelism at the number of groups (5 event types = 5 tasks
    * sorting whole-corpus fractions at 100 TB); here the heavy sort is
    * a RANGE partition on (grp, value, tie) — parallelism scales with
    * DATA SIZE — and the only per-group bookkeeping happens on the tiny
    * (partition × group) count frame:
    *  1. range-partition, count rows per (pid, grp);
    *  2. on that bounded frame, per-group running offsets locate the ONE
    *     partition holding each group's target rank (n+1) DIV 2;
    *  3. broadcast those locators back; a window partitioned by
    *     (pid, grp) — each partition at most one range-partition of rows,
    *     never a whole group — ranks locally, adds the offset, keeps the
    *     row whose global in-group rank is the target.
    * The sort must reach a total order (unique `tie` within group).
    * Returns one (grp, out) row per group — bit-identical to the
    * PARTITION BY grp row_number formulation it replaces.
    */
  private[graft] def groupLowerMedian(df: DataFrame, grp: String,
      value: String, tie: String, out: String): DataFrame = {
    val (base, offs) = groupRankScaffold(df, grp, Seq(col(value), col(tie)))
    // prune to the ONE partition holding each group's target rank before
    // ranking anything — a median consumer never ranks the full frame
    val locators = offs
      .withColumn("target", expr("(n + 1) DIV 2"))
      .filter(col("target") > col("off") &&
        col("target") <= col("off") + col("c"))
      .select(col("pid"), col(grp), col("off"), col("target"))
    val wIn = Window.partitionBy(col("pid"), col(grp))
      .orderBy(col(value), col(tie))
    base.join(broadcast(locators), Seq("pid", grp))
      .withColumn("rr", row_number().over(wIn).cast("long") + col("off"))
      .filter(col("rr") === col("target"))
      .select(col(grp), col(value).as(out))
  }

  /** Shared scaffold of the grouped exact-rank family: range-partition on
    * (grp, sortCols…), materialize, and compute the tiny
    * (pid, grp, c, off, n) ledger — per-(partition, group) row count,
    * the group's cumulative offset before that partition, and total
    * group size. The ledger is (partitions × groups) rows; this
    * machinery is specifically for LOW-cardinality groups (where a
    * `PARTITION BY grp` window caps parallelism at the group count and
    * the ledger broadcast is trivially small). High-cardinality groups
    * don't need it: an ordinary hash-partitioned window already
    * parallelizes across groups.
    */
  private def groupRankScaffold(df: DataFrame, grp: String,
      sortCols: Seq[org.apache.spark.sql.Column]): (DataFrame, DataFrame) = {
    val base = df.repartitionByRange(col(grp) +: sortCols: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // two consumers + offsets must describe THIS partitioning
    val wOff = Window.partitionBy(col(grp)).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wN = Window.partitionBy(col(grp))
    val offs = base.groupBy(col("pid"), col(grp))
      .agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("c")).over(wN))
    (base, offs)
  }

  /** Every row's EXACT rank within its group (plus the group size) with
    * the [[groupRankScaffold]] plan shape — the full-rank sibling of
    * [[groupLowerMedian]] for consumers that need all ranks (Gini's
    * Σ i·x₍ᵢ₎, per-group ntile). Appends long columns `r` (1-based rank
    * in (sortCols) order within `grp`) and `n` (group size); `pid`/`r`/
    * `n`/`c`/`off` are reserved names the input must not carry. The sort
    * must reach a total order within each group. Bit-identical to
    * `row_number() OVER (PARTITION BY grp ORDER BY sortCols…)` + a group
    * count, without its group-count parallelism ceiling.
    */
  private[graft] def withExactGroupRank(df: DataFrame, grp: String,
      sortCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val (base, offs) = groupRankScaffold(df, grp, sortCols)
    val wIn = Window.partitionBy(col("pid"), col(grp)).orderBy(sortCols: _*)
    base.join(broadcast(offs.select(col("pid"), col(grp), col("off"),
        col("n"))), Seq("pid", grp))
      .withColumn("r", row_number().over(wIn).cast("long") + col("off"))
      .drop("pid", "off")
  }

  /** `ntile(k) OVER (PARTITION BY grp ORDER BY sortCols…)` semantics on
    * [[withExactGroupRank]] — per-group equal-count bucketing (feature
    * binning, per-key deciles) with no low-cardinality window. Same
    * first-buckets-take-the-extra-row arithmetic as [[ntileBucket]],
    * with the bucket widths depending on each group's own n.
    */
  private[graft] def groupNtile(df: DataFrame, grp: String,
      sortCols: Seq[org.apache.spark.sql.Column], k: Long,
      out: String): DataFrame =
    withExactGroupRank(df, grp, sortCols)
      .withColumn(out,
        when(expr(s"n DIV $k") === 0, col("r").cast("int"))
          .otherwise(when(col("r") <= expr(s"(n % $k) * (n DIV $k + 1)"),
              expr(s"CAST((r - 1) DIV (n DIV $k + 1) + 1 AS INT)"))
            .otherwise(expr(s"CAST(n % $k + " +
              s"(r - 1 - (n % $k) * (n DIV $k + 1)) DIV (n DIV $k) + 1" +
              " AS INT)"))))
      .drop("r", "n")

  /** Quartile assignment (ntile) of customers by balance, summarized —
    * on [[withExactGlobalRank]] instead of an unpartitioned Window (which
    * would serialize the whole table through one task at scale). The ntile
    * bucket is pure arithmetic on the exact global rank, bit-identical to
    * `ntile(4) OVER (ORDER BY …)` (first n%4 buckets get the extra row).
    */
  /** `ntile(k) OVER (ORDER BY sortCols)` as pure arithmetic on the exact
    * global rank — bit-identical to the SQL function (first n%k buckets
    * take the extra row) without its single-task global sort. Shared by
    * [[ntileQuartiles]] and [[EventOps.rfm]]'s three scorings. The sort
    * must be a total order (include a unique tiebreaker).
    */
  private[graft] def ntileBucket(df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column], k: Long,
      out: String): DataFrame = {
    val (ranked, n) = withExactGlobalRank(df, sortCols)
    val fl = n / k; val rem = n % k; val cut = rem * (fl + 1)
    ranked
      .withColumn(out,
        if (fl == 0) col("r").cast("int")
        else when(col("r") <= cut,
            expr(s"CAST((r - 1) DIV ${fl + 1} + 1 AS INT)"))
          .otherwise(expr(s"CAST($rem + (r - 1 - $cut) DIV $fl + 1 AS INT)")))
      .drop("r")
  }

  def ntileQuartiles(s: SparkSession, d: String): DataFrame = {
    ntileBucket(
      Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
      Seq(col("c_acctbal"), col("c_custkey")), 4L, "quartile")
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"))
      .orderBy(col("quartile"))
  }

  /** percent_rank + cume_dist — the relative-standing pair (the last two
    * standard ranking functions the family lacked): each probed event's
    * standing within its type. Rank ties resolve by VALUE only (the
    * standard semantics — equal values share a rank), so both doubles
    * are the same (rank−1)/(n−1) and peers/n expressions on both
    * engines; output is bounded by probing every 500th event_id.
    */
  def relativeStanding(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
    Tables.events(s, d)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .filter(col("event_id") % 500 === 0)
      .select(col("event_type"), col("event_id"), col("value"),
        col("pr"), col("cd"))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** first/last order per status over a deterministic full-frame window. */
  def firstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .withColumn("first_key", first(col("o_orderkey")).over(w))
      .withColumn("last_key", last(col("o_orderkey")).over(w))
      .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(w))
      .select(col("o_orderstatus"), col("first_key"), col("last_key"),
        col("second_key"))
      .distinct()
      .orderBy(col("o_orderstatus"))
  }

  /** MAX DRAWDOWN per user — the peak-to-trough risk readout, over the
    * signed net-flow series (+value on purchase, −value otherwise):
    * cum_i = running sum, peak_i = running max(cum), drawdown =
    * max(peak − cum). Two stacked per-user windows after ONE shuffle on
    * user_id (the second window reuses the first's partitioning — no
    * extra exchange), ordered by (ts, event_id) for a total per-user
    * order. All-BIGINT milli-unit arithmetic: no float anywhere, the
    * strictest hash-compare class.
    */
  def maxDrawdown(s: SparkSession, d: String): DataFrame =
    drawdownOn(Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase",
            floor(col("value") * 1000).cast("long"))
          .otherwise(-floor(col("value") * 1000).cast("long")).as("dv")),
      "user_id", Seq("ts", "event_id"), "dv")

  /** Generic core: `orderCols` must totally order each group. */
  private[graft] def drawdownOn(df: DataFrame, grpCol: String,
      orderCols: Seq[String], deltaCol: String): DataFrame = {
    val w = Window.partitionBy(col(grpCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col(deltaCol)).over(w))
      .withColumn("peak", max(col("cum")).over(w))
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n_events"),
        max(col("peak") - col("cum")).as("max_drawdown_milli"),
        // the final cum IS the group total — order-free, unlike last()
        sum(col(deltaCol)).as("final_milli"))
      .orderBy(col(grpCol))
  }

  val queries = Map(
    "win_drawdown" -> (maxDrawdown _),
    "win_topk_per_group" -> (topkPerGroup _),
    "win_group_median" -> (groupMedian _),
    "win_group_quantiles" -> (groupQuantiles _),
    "win_rank_dense" -> (rankDense _),
    "win_lag_delta" -> (lagDelta _),
    "win_running_sum" -> (runningSum _),
    "win_moving_avg" -> (movingAvg _),
    "win_ntile" -> (ntileQuartiles _),
    "win_percent_rank" -> (relativeStanding _),
    "win_first_last" -> (firstLast _))

  val oracle = Map(
    "win_drawdown" ->
      """WITH f AS (SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase'
               THEN CAST(floor(value * 1000) AS BIGINT)
               ELSE -CAST(floor(value * 1000) AS BIGINT) END AS dv
           FROM events),
         c AS (SELECT user_id, ts, event_id, dv,
             sum(dv) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM f),
         p AS (SELECT user_id, dv, cum,
             max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
           FROM c)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(peak - cum) AS BIGINT) AS max_drawdown_milli,
           CAST(sum(dv) AS BIGINT) AS final_milli
         FROM p GROUP BY user_id ORDER BY user_id""",
    "win_percent_rank" ->
      """SELECT event_type, event_id, value, pr, cd FROM (
           SELECT event_type, event_id, value,
             percent_rank() OVER (PARTITION BY event_type
               ORDER BY value) AS pr,
             cume_dist() OVER (PARTITION BY event_type
               ORDER BY value) AS cd
           FROM events)
         WHERE event_id % 500 = 0 ORDER BY event_type, event_id""",
    "win_group_quantiles" ->
      """WITH o AS (SELECT c_mktsegment, o_orderkey, o_totalprice
           FROM orders JOIN customer ON o_custkey = c_custkey),
         t AS (SELECT c_mktsegment AS seg, pct,
             CAST(ceil(pct * n / 100.0) AS BIGINT) AS r
           FROM (SELECT c_mktsegment, count(*) AS n FROM o
                 GROUP BY c_mktsegment),
                unnest([25, 50, 75, 95]) AS u(pct)),
         rr AS (SELECT c_mktsegment, o_totalprice,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn
           FROM o)
         SELECT c_mktsegment, CAST(pct AS INT) AS pct, r AS pos,
           o_totalprice AS value
         FROM rr JOIN t ON c_mktsegment = seg AND rn = r
         ORDER BY c_mktsegment, pct""",
    "win_group_median" ->
      """WITH o AS (SELECT c_mktsegment, o_orderkey, o_totalprice
           FROM orders JOIN customer ON o_custkey = c_custkey),
         r AS (SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY c_mktsegment) AS n
           FROM o)
         SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
           o_totalprice AS median_price, o_orderkey AS median_orderkey
         FROM r WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
         ORDER BY c_mktsegment""",
    "win_topk_per_group" ->
      """SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
           SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_orderstatus, rn""",
    "win_rank_dense" ->
      """SELECT p_brand, p_partkey, p_size, rk, drk, prk, cd FROM (
           SELECT p_brand, p_partkey, p_size,
             rank() OVER w AS rk,
             dense_rank() OVER w AS drk,
             percent_rank() OVER w AS prk,
             cume_dist() OVER w AS cd
           FROM part
           WINDOW w AS (PARTITION BY p_brand ORDER BY p_size DESC))
         WHERE rk <= 5 ORDER BY p_brand, p_size DESC, p_partkey""",
    "win_lag_delta" ->
      """SELECT event_id, user_id, value, value - prev_value AS delta,
           next_value FROM (
           SELECT event_id, user_id, value,
             lag(value, 1) OVER w AS prev_value,
             lead(value, 1) OVER w AS next_value
           FROM events WHERE event_type = 'purchase'
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         ORDER BY event_id""",
    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
         FROM orders WHERE o_custkey <= 300
         ORDER BY o_custkey, o_orderdate, o_orderkey""",
    "win_moving_avg" ->
      """SELECT event_id, event_type, value,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS mov_avg
         FROM events
         WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "win_ntile" ->
      """SELECT quartile, count(*) AS n, min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal
         FROM (SELECT c_acctbal,
             ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
           FROM customer)
         GROUP BY quartile ORDER BY quartile""",
    "win_first_last" ->
      """SELECT DISTINCT o_orderstatus,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER w AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_orderstatus""")
}
