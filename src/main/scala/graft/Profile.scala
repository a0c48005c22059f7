package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named query (repeated) and print its physical plan.
  * Usage: runMain graft.Profile <queryName> [sfDir] [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    // per-rep job ledger: where the wall time actually goes (fixed
    // per-job scheduling overhead vs task work) — jobs with their wall
    // durations, so "N jobs × ~Xms" reads straight off the output
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(s.jobId, (s.time, 0L))
        override def onJobEnd(
            s: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.computeIfPresent(s.jobId, (_, v) => (v._1, s.time))
      })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      jobs.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat before reading
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val ds = jobs.values.asScala.toSeq
        .filter(_._2 > 0).map(v => (v._2 - v._1) / 1e3).sorted.reverse
      println(f"[profile] $name rep $i: $wall%.3f s ($n rows); " +
        f"${ds.size} jobs, job-wall sum ${ds.sum}%.2f s, " +
        s"top: ${ds.take(6).map(d => f"$d%.2f").mkString(", ")}")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
