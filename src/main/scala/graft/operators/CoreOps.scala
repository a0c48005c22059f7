package graft.operators

import graft.{OpFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MapReduce core primitives as Spark declarative plans (SURVEY.md §2.1,
  * §2.3): map = projection with computed columns, filter = predicate (pushed
  * into the parquet scan by Catalyst), distinct, systematic sampling, limit.
  *
  * Scale notes: projection/filter are narrow (no shuffle); `distinct` is a
  * hash aggregate with map-side partial dedup (the MR "map k→(k,null)" idiom,
  * but with the combiner planned automatically); the systematic sample uses
  * `pmod(key, n)` instead of `rand()` so the oracle can replay it — and at
  * 100 TB a deterministic hash-mod sample is also what you want for
  * repeatable pipelines.
  */
object CoreOps extends OpFamily {

  /** map pattern: per-row computed columns, no shuffle at all. */
  def mapProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 45)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("charge"),
        (col("l_quantity") * 2).as("double_qty"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** filter/grep pattern: predicate pushdown reaches the parquet scan. */
  def filterGrep(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "error" && col("value") > 150.0)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))

  /** distinct pattern (MR: map k→(k,null); reduce emits k). */
  def distinctPairs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"))
      .distinct()
      .orderBy(col("user_id"), col("event_type"))

  /** deterministic systematic sample: hash-mod on a stable key. */
  def sampleSystematic(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** top-n head after a total order (limit pushdown → TakeOrderedAndProject). */
  def limitHead(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
      .limit(25)

  /** Job merging (MRDP ch.6): one filtered pass over the input feeds two
    * different aggregations, materialized once via localCheckpoint() and
    * re-read by the second branch — the "share one scan across jobs"
    * pattern that in the reference needs manual intermediate files.
    * localCheckpoint (not persist): its blocks are released by the
    * ContextCleaner when the plan is GC'd, so repeated Verify/Bench calls
    * in one long-lived session don't accumulate cached copies.
    */
  def sharedScanMultiOutput(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
      .localCheckpoint()
    val byUser = base.groupBy(col("user_id").cast("string").as("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"))
      .withColumn("dim", lit("by_user"))
    val byDay = base.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"))
      .withColumn("dim", lit("by_day"))
    byUser.unionByName(byDay)
      .select(col("dim"), col("key"), col("n"), col("sum_v"))
      .orderBy(col("dim"), col("key"))
  }

  /** CDC UPSERT / MERGE compaction — the warehouse "apply a changelog to
    * a snapshot" pattern (the reference-era version is a reduce-side
    * merge keyed on the primary key): base = the customer snapshot;
    * changes = one row per ordering customer carrying their LATEST
    * order's total as the new balance, flagged 'D' (delete) when that
    * order is fully shipped ('F' status, an arbitrary-but-deterministic
    * delete rule). The merge keeps the highest-version row per key and
    * drops deletes — exactly MERGE INTO ... WHEN MATCHED UPDATE/DELETE
    * semantics, expressed as union + one keyed window (never a join of
    * base×changes beyond the shuffle both sides already need).
    *
    * Scale shape: two shuffles on the key (latest-change dedup, merge) —
    * on a bucketed base table the merge window rides the bucketing and
    * only the (smaller) changelog shuffles; version beats timestamps for
    * idempotent replays.
    */
  def upsert(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.customer(s, d)
      .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"),
        lit(0L).as("version"), lit("U").as("op"))
    val wLatest = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val changes = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("o_orderstatus"))
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("key"), col("o_totalprice").as("bal"),
        lit(1L).as("version"),
        when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"))
    val wMerge = Window.partitionBy(col("key"))
      .orderBy(col("version").desc)
    base.unionByName(changes)
      .withColumn("rn", row_number().over(wMerge))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("key"), col("bal"), col("version"))
      .orderBy(col("key"))
  }

  /** SKYLINE (Pareto front, Börzsönyi et al. ICDE 2001): the parts no
    * other part beats on BOTH axes — minimize retail price, maximize
    * size ("cheapest for at least this size"). A row is dominated iff
    * some row is no worse on both axes and strictly better on one.
    *
    * Scale shape (the reason this isn't the textbook O(n²) self-join):
    * for the 2-D case the skyline is exactly the rows whose y exceeds
    * the max y of every STRICTLY cheaper row — a prefix-max along the
    * price order. A single global window would compute it but cannot
    * distribute (PlanGuard bans unpartitioned windows for that reason),
    * so the prefix-max is split into three bounded pieces:
    *   1. bucket the price axis into `buckets` fixed-width cells
    *      (integer cents arithmetic — no float bucket edges);
    *   2. per-bucket max y (B-row aggregate), strict-predecessor
    *      prefix-max via a broadcast theta join on the B-row frame
    *      (B² pairs, driver-bounded);
    *   3. WITHIN each bucket a partitioned window
    *      (RANGE UNBOUNDED..−1 over cents — peers excluded, so equal
    *      prices never "dominate" through the frame) supplies the
    *      intra-bucket strict prefix; an equal-price partition max
    *      handles same-price domination.
    * Survivor ⇔ y = max(y | same price) AND y > max(prefix, in-bucket).
    * Every shuffle is keyed (bucket / price), every join broadcast; at
    * 100 TB the only all-pairs work is B², a constant. Duplicate
    * (price, size) points are mutually non-dominating and both kept —
    * the oracle's window formulation agrees by construction.
    */
  def skylinePart(s: SparkSession, d: String): DataFrame =
    skylineOn(Tables.part(s, d), "p_partkey", "p_retailprice", "p_size")

  private[graft] def skylineOn(df: DataFrame, idCol: String,
      minCol: String, maxCol: String, buckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 1, s"skyline needs >= 1 bucket: $buckets")
    val base = df.select(col(idCol).as("id"),
      floor(col(minCol) * 100).cast("long").as("xu"),
      col(maxCol).cast("long").as("y"))
    val mm = base.agg(min(col("xu")).as("x0"), max(col("xu")).as("x1"))
    val b = base.crossJoin(broadcast(mm)) // 1-row axis extent
      .withColumn("bk",
        expr(s"((xu - x0) * $buckets) DIV (x1 - x0 + 1)"))
      .drop("x0", "x1")
    val bmax = b.groupBy(col("bk")).agg(max(col("y")).as("bmy"))
    val pre = bmax // strict-predecessor running max over <= B rows
      .join(broadcast(bmax.select(col("bk").as("bk2"), col("bmy").as("bmy2"))),
        col("bk2") < col("bk"), "left")
      .groupBy(col("bk")).agg(max(col("bmy2")).as("pmax"))
    val wB = Window.partitionBy(col("bk")).orderBy(col("xu"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wX = Window.partitionBy(col("xu"))
    b.join(broadcast(pre), Seq("bk"))
      .withColumn("m1", max(col("y")).over(wB))
      .withColumn("mx", max(col("y")).over(wX))
      .filter(col("y") === col("mx") &&
        col("y") > coalesce(greatest(col("m1"), col("pmax")),
          lit(Long.MinValue)))
      .select(col("id").as(idCol), col("xu").as("price_cents"),
        col("y").as("size_v"))
      .orderBy(col("price_cents"), col(idCol))
  }

  val queries = Map(
    "core_skyline" -> (skylinePart _),
    "core_upsert" -> (upsert _),
    "core_shared_scan" -> (sharedScanMultiOutput _),
    "core_map_project" -> (mapProject _),
    "core_filter" -> (filterGrep _),
    "core_distinct" -> (distinctPairs _),
    "core_sample_systematic" -> (sampleSystematic _),
    "core_limit" -> (limitHead _))

  val oracle = Map(
    "core_skyline" ->
      """WITH b AS (SELECT p_partkey,
             CAST(floor(p_retailprice * 100) AS BIGINT) AS xu,
             CAST(p_size AS BIGINT) AS y
           FROM part),
         w AS (SELECT p_partkey, xu, y,
             max(y) OVER (ORDER BY xu
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
             max(y) OVER (PARTITION BY xu) AS mx
           FROM b)
         SELECT p_partkey, xu AS price_cents, y AS size_v FROM w
         WHERE y = mx AND y > coalesce(m1, -9223372036854775807 - 1)
         ORDER BY price_cents, p_partkey""",
    "core_upsert" ->
      """WITH base AS (
           SELECT c_custkey AS key, c_acctbal AS bal,
             CAST(0 AS BIGINT) AS version, 'U' AS op
           FROM customer),
         latest AS (
           SELECT o_custkey, o_totalprice, o_orderstatus FROM (
             SELECT o_custkey, o_totalprice, o_orderstatus,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders) WHERE rn = 1),
         changes AS (
           SELECT o_custkey AS key, o_totalprice AS bal,
             CAST(1 AS BIGINT) AS version,
             CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
           FROM latest),
         merged AS (
           SELECT key, bal, version, op,
             row_number() OVER (PARTITION BY key
               ORDER BY version DESC) AS rn
           FROM (SELECT * FROM base UNION ALL SELECT * FROM changes))
         SELECT key, bal, version FROM merged
         WHERE rn = 1 AND op <> 'D' ORDER BY key""",
    "core_shared_scan" ->
      """SELECT dim, key, n, sum_v FROM (
           SELECT 'by_user' AS dim, CAST(user_id AS VARCHAR) AS key,
             count(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
           FROM events WHERE event_type = 'purchase' GROUP BY user_id
           UNION ALL
           SELECT 'by_day', strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d'),
             count(*),
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
           FROM events WHERE event_type = 'purchase'
           GROUP BY strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d'))
         ORDER BY dim, key""",
    "core_map_project" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
         l_quantity * 2 AS double_qty
         FROM lineitem WHERE l_quantity >= 45
         ORDER BY l_orderkey, l_linenumber""",
    "core_filter" ->
      """SELECT event_id, user_id, value
         FROM events WHERE event_type = 'error' AND value > 150.0
         ORDER BY event_id""",
    "core_distinct" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    "core_sample_systematic" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE doc_id % 10 = 0 ORDER BY doc_id""",
    "core_limit" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
         ORDER BY p_partkey LIMIT 25""")
}
