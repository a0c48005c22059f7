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

  val queries = Map(
    "core_upsert" -> (upsert _),
    "core_shared_scan" -> (sharedScanMultiOutput _),
    "core_map_project" -> (mapProject _),
    "core_filter" -> (filterGrep _),
    "core_distinct" -> (distinctPairs _),
    "core_sample_systematic" -> (sampleSystematic _),
    "core_limit" -> (limitHead _))

  val oracle = Map(
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
