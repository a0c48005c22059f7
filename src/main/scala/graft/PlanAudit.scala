package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: one-line physical-plan summary per registered query —
  * exchange count, join strategies, scan pushdown — to catch accidental
  * cartesian products, missed broadcasts, or unpushed filters across the
  * whole registry at once. Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).length
        val flags = Seq(
          "xchg" -> n("Exchange"),
          "bhj" -> n("BroadcastHashJoin"),
          "smj" -> n("SortMergeJoin"),
          "bnlj" -> n("BroadcastNestedLoopJoin"),
          "cart" -> n("CartesianProduct"),
          "pushed" -> n("PushedFilters: \\[[^]]"),
          "agg" -> n("HashAggregate"))
          .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[audit] $name: $flags")
      } catch { case e: Throwable =>
        println(s"[audit] $name: ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
