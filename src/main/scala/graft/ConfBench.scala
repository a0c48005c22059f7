package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the driver contract): time a named subset of the
  * registry under EXTRA session confs, so a candidate optimization config
  * can be A/B'd in a couple of minutes instead of a full 311-query bench.
  *
  * Usage:
  *   SPARK_GRAFT_EXTRA_CONFS="k=v;k=v" \
  *   sbt "runMain graft.ConfBench <reps> <query> [query ...]"
  *
  * Matches Bench's methodology: master local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions=$cpus, warm-up job, min of N reps, unpersist
  * between queries.
  */
object ConfBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extra = sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONFS", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val i = kv.indexOf('='); (kv.take(i).trim, kv.drop(i + 1).trim)
      }
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
    extra.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    if (extra.nonEmpty)
      println(s"[confbench] extra: ${extra.map(kv => kv._1 + "=" + kv._2).mkString(", ")}")
    var total = 0.0
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        dt
      }
      total += times.min
      println(f"[confbench] $name%-32s min ${times.min}%.3f  all ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    println(f"[confbench] TOTAL (min-sum) $total%.3f s over ${names.size} queries")
    spark.stop()
  }
}
