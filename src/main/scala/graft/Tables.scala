package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (FIXTURES.md).
  *
  * All graft operators take `(SparkSession, sfDir)` and read from here so
  * that the scan layer is in one place: `spark.read.parquet` gives Catalyst
  * a vectorized, pushdown-capable scan (PushedFilters / ReadSchema prune at
  * the row-group level), which is the 100 TB-scale entry point — no
  * schema-inference or per-record parse code sits between the file and the
  * plan.
  */
object Tables {
  /** One relation per (session, dir, table): `spark.read.parquet` infers
    * schema and lists files EVERY call, so a registry of 130+ queries
    * re-reading ten fixture tables pays footer+listing I/O hundreds of
    * times for identical immutable relations. A long-lived session (or
    * any catalog-backed deployment) resolves a table once — this cache
    * is that, keyed by session. DataFrames are immutable plans: sharing
    * one across queries cannot leak state between them.
    *
    * Lifecycle: the first insert for a session registers a listener that
    * drops ALL of that session's entries on application end, so stopped
    * sessions hold no strong references here for the JVM lifetime (a
    * long-lived driver JVM cycling many sessions would otherwise leak
    * every session + its resolved relations).
    *
    * CONTRACT: a fixture path is immutable for the life of the session.
    * Rewriting files under a cached (dir, table) within one session would
    * serve the stale file listing/schema — exactly like an external
    * catalog; writers that need to re-read must use a fresh dir (all io_*
    * roundtrips write to fresh temp dirs and bypass this cache entirely).
    */
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, String), DataFrame]()
  private val evictionHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (evictionHooked.add(spark)) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            relationCache.keySet.removeIf(_._1 eq spark)
            evictionHooked.remove(spark)
          }
        })
    }
    relationCache.computeIfAbsent((spark, sfDir, name),
      _ => spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** Session conf the events table requires; see [[events]]. Set it at
    * session build (all graft mains and TestSpark do).
    */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** `events.ts` has changed physical type across fixture generations:
    * parquet TIMESTAMP(NANOS) (rejected by the vectorized reader unless
    * [[NanosConf]] reads it as a long) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (read as TIMESTAMP_NTZ). Branch on the
    * ACTUAL read schema, not an assumption about the generator, and
    * normalize every variant to plain TimestampType so downstream
    * epoch arithmetic (`unix_micros` et al) resolves:
    *  - long ⇒ nanoseconds; truncate to micros with integer `DIV`
    *    (exact above 2^53, and the same ns→µs cast DuckDB applies, so
    *    oracle comparisons stay aligned);
    *  - TIMESTAMP_NTZ ⇒ cast to TIMESTAMP — an identity on the wall
    *    clock under the UTC session timezone every graft main sets,
    *    and the instant semantics all prior oracle-green rounds ran
    *    with.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption(NanosConf).contains("true"),
      s"reading events requires $NanosConf=true at session build " +
        "(parquet TIMESTAMP(NANOS) is unsupported by the vectorized reader)")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw // already TimestampType: nothing to convert
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}

/** One family of operators: a set of named queries plus, where
  * SQL-expressible, a DuckDB-dialect oracle twin per query (driver contract,
  * SURVEY.md §3.3). Families register in [[SparkEntry]].
  */
trait OpFamily {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]

  /** Registry names of this family's SWEEP-INSTRUMENT queries —
    * tuning-knob measurement twins whose Scaladoc declares a documented
    * instrument bound (an exact n²/all-sources/compacted-twin baseline)
    * swept or compared over a knob grid, as opposed to production
    * paths. Declared AT REGISTRATION so graft.Bench derives its
    * `instruments_s` subtotal structurally instead of from a parallel
    * hand-maintained list a new sweep could silently miss (r17 verdict
    * #6). Every name must also be a `queries` key — SparkEntry checks.
    */
  def instruments: Set[String] = Set.empty
}
