package graft.operators

import graft.{OpFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.7). In the reference these are tagged-union
  * reducer idioms (group by key, inspect which input tags are present); here
  * they are single logical operators that Catalyst plans as aggregates
  * (set semantics) or tagged aggregates (bag semantics) — one shuffle each,
  * with map-side partial dedup for the set-semantic variants.
  */
object SetOps extends OpFamily {

  private def users(s: SparkSession, d: String, typ: String): DataFrame =
    Tables.events(s, d).filter(col("event_type") === typ).select(col("user_id"))

  /** UNION ALL of two tagged projections, re-aggregated (bag union). */
  def unionTagged(s: SparkSession, d: String): DataFrame =
    users(s, d, "click").withColumn("src", lit("click"))
      .unionByName(users(s, d, "purchase").withColumn("src", lit("purchase")))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("src"))

  /** Set intersection: users who both clicked and purchased. */
  def intersectUsers(s: SparkSession, d: String): DataFrame =
    users(s, d, "click").intersect(users(s, d, "purchase"))
      .orderBy(col("user_id"))

  /** Set difference at (user, day) grain: click-days with no error. */
  def exceptUsers(s: SparkSession, d: String): DataFrame = {
    def userDays(typ: String) = Tables.events(s, d)
      .filter(col("event_type") === typ)
      .select(col("user_id"), col("ts").cast("date").as("day"))
    userDays("click").except(userDays("error"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Bag intersection: each user min(#click, #view) times, re-counted. */
  def intersectAllCounts(s: SparkSession, d: String): DataFrame =
    users(s, d, "click").intersectAll(users(s, d, "view"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("user_id"))

  /** Bag difference: each user max(0, #click − #view) times, re-counted. */
  def exceptAllCounts(s: SparkSession, d: String): DataFrame =
    users(s, d, "click").exceptAll(users(s, d, "view"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("user_id"))

  val queries = Map(
    "set_union_tagged" -> (unionTagged _),
    "set_intersect" -> (intersectUsers _),
    "set_except" -> (exceptUsers _),
    "set_intersect_all" -> (intersectAllCounts _),
    "set_except_all" -> (exceptAllCounts _))

  val oracle = Map(
    "set_union_tagged" ->
      """SELECT src, count(*) AS n_events, count(DISTINCT user_id) AS n_users
         FROM (SELECT user_id, 'click' AS src FROM events WHERE event_type='click'
               UNION ALL
               SELECT user_id, 'purchase' AS src FROM events WHERE event_type='purchase')
         GROUP BY src ORDER BY src""",
    "set_intersect" ->
      """SELECT user_id FROM events WHERE event_type='click'
         INTERSECT
         SELECT user_id FROM events WHERE event_type='purchase'
         ORDER BY user_id""",
    "set_except" ->
      """SELECT user_id, day FROM (
           SELECT user_id, CAST(ts AS DATE) AS day FROM events
           WHERE event_type='click'
           EXCEPT
           SELECT user_id, CAST(ts AS DATE) FROM events
           WHERE event_type='error')
         ORDER BY user_id, day""",
    "set_intersect_all" ->
      """SELECT user_id, count(*) AS n FROM (
           SELECT user_id FROM events WHERE event_type='click'
           INTERSECT ALL
           SELECT user_id FROM events WHERE event_type='view')
         GROUP BY user_id ORDER BY user_id""",
    "set_except_all" ->
      """SELECT user_id, count(*) AS n FROM (
           SELECT user_id FROM events WHERE event_type='click'
           EXCEPT ALL
           SELECT user_id FROM events WHERE event_type='view')
         GROUP BY user_id ORDER BY user_id""")
}
