package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §3.3 + the builder prompt.
  *
  * Every operator family registers its named queries and (where
  * SQL-expressible) DuckDB oracle twins here; the driver's Verify/Bench
  * harness iterates these maps.
  */
object SparkEntry {
  private val families: Seq[OpFamily] = Seq(
    CoreOps, AggOps, JoinOps, WindowOps, SetOps, ScalarOps,
    TextOps, DedupOps, SimOps, StreamOps, IoOps, ReduceOps, MultimodalOps,
    FilterOps, GraphOps, PipelineOps, EventOps, UrlOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggOps.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(_.oracle).toMap

  /** The registry-declared sweep instruments (see OpFamily.instruments)
    * — Bench's `instruments_s` membership, validated against the query
    * registry so a renamed query can't silently drop out of the
    * subtotal. */
  def instruments: Set[String] = {
    val tagged = families.flatMap(_.instruments).toSet
    val unknown = tagged -- queries.keySet
    require(unknown.isEmpty,
      s"instrument tags without a registered query: $unknown")
    tagged
  }
}
