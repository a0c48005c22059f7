package graft.operators

import graft.{OpFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Advanced filtering patterns (SURVEY.md §2.3 #18–19): the MRDP ch.3
  * "filtering with a Bloom filter" idiom and seeded random sampling.
  *
  * Scale notes: the Bloom pre-filter is the canonical way to shrink the big
  * side of a selective join before the shuffle — the sketch is built from
  * the small side (one pass, driver-merged), broadcast to every task, and
  * applied inside the scan pipeline; the exact join afterwards removes the
  * false positives, so results are exact while shuffle volume drops by the
  * filter's selectivity. (Spark can also do this automatically via
  * spark.sql.optimizer.runtime.bloomFilter.enabled — this operator is the
  * explicit, composable form.)
  */
object FilterOps extends OpFamily {

  /** Bloom-prefiltered semi join: lineitems of high-value orders. The Bloom
    * filter (built on the dimension side, broadcast) prunes the fact table
    * before the exact semi join; false positives are removed by the join,
    * so the output is exactly the semi join — which is what the oracle
    * checks.
    */
  def bloomSemiJoin(s: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
    // Distributed build: per-partition sketches merged by Spark's native
    // BloomFilterAggregate; ~958 kbit ≈ 0.01 fpp at 100k keys. The probe is
    // the codegen'd BloomFilterMightContain over the serialized filter as a
    // literal, so the lineitem scan pipeline stays one WholeStageCodegen
    // span (a Scala UDF here used to break codegen fusion).
    val bloomBytes = bigOrders
      .agg(graft.functions.NativeExprs
        .bloomAgg(s, col("o_orderkey"), 100000L, 958506L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    Tables.lineitem(s, d)
      .filter(graft.functions.NativeExprs.bloomMightContain(s,
        lit(bloomBytes), col("l_orderkey"))) // sketch prefilter (cheap)
      .join(bigOrders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi") // exact
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
      .orderBy(col("l_orderkey"))
  }

  /** Seeded Bernoulli sample — deterministic within Spark (fixed seed) but
    * not replayable in another engine, so registered rows-only; statistical
    * properties are asserted in scalatest.
    */
  def sampleSeeded(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .sample(withReplacement = false, fraction = 0.1, seed = 42)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** Deterministic 10% Bernoulli sample by multiplicative hash of the row
    * key — unlike [[sampleSeeded]] this replays identically in ANY engine
    * (oracle-checked), which is the property a repeatable 100 TB pipeline
    * actually wants from its sampling stage: re-runs, backfills, and
    * downstream joins all see the same sample.
    */
  def sampleHash(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      // operands are reduced mod 1000 BEFORE multiplying so the product can
      // never overflow int64 — (a*b) mod m == ((a mod m)*(b mod m)) mod m,
      // so the selected sample is identical, but the arithmetic stays exact
      // at any orderkey magnitude (Spark would silently wrap, DuckDB would
      // raise; both now agree at any scale factor).
      .filter(pmod(pmod(col("l_orderkey"), lit(1000)) * lit(761L) +
        pmod(col("l_linenumber"), lit(1000)) * lit(503L), lit(1000)) < 100)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
      .orderBy(col("l_returnflag"))

  /** Stratified deterministic sampling — the data-MIXING step of a training
    * pipeline: each stratum (language) gets its own keep-rate (down-sample
    * the over-represented head, keep the tail), decided by the same
    * wrap-safe multiplicative hash as [[sampleHash]], so the mix is
    * replayable in any engine and stable across re-runs/backfills. The
    * per-stratum rate lookup is a broadcast map literal — no join, no
    * shuffle before the final bounded aggregate.
    */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    // keep-rate per 1000 by language: halve English, keep minority langs
    val rates: Map[String, Long] = Map("en" -> 500L, "es" -> 800L)
    val rate = coalesce(element_at(typedLit(rates), col("lang")), lit(1000L))
    Tables.documents(s, d)
      .filter(pmod(pmod(col("doc_id"), lit(1000)) * lit(761L), lit(1000))
        < rate)
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), " ")).as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"),
        sum(col("n_chars")).cast("bigint").as("n_chars"))
      .orderBy(col("lang"))
  }

  val queries = Map(
    "filter_bloom_semi_join" -> (bloomSemiJoin _),
    "filter_sample_seeded" -> (sampleSeeded _),
    "filter_sample_stratified" -> (sampleStratified _),
    "filter_sample_hash" -> (sampleHash _))

  val oracle = Map(
    "filter_bloom_semi_join" ->
      """SELECT l_orderkey, count(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_orderkey = l_orderkey
                         AND o_totalprice > 300000)
         GROUP BY l_orderkey ORDER BY l_orderkey""",
    "filter_sample_stratified" ->
      """SELECT lang, count(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
         FROM documents
         WHERE ((doc_id % 1000) * 761) % 1000 <
           (CASE lang WHEN 'en' THEN 500 WHEN 'es' THEN 800 ELSE 1000 END)
         GROUP BY lang ORDER BY lang""",
    "filter_sample_hash" ->
      """SELECT l_returnflag, count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE ((l_orderkey % 1000) * 761 + (l_linenumber % 1000) * 503)
               % 1000 < 100
         GROUP BY l_returnflag ORDER BY l_returnflag""")
}
