package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: MEASURED scaling evidence for the 100 TB story. Times every
  * registered query at two scale factors in ONE JVM (min of REPS, warm
  * codegen, artifact stores pre-built per SF by the run itself) and
  * prints each query's time ratio next to the data ratio.
  *
  * Reading the number: the big fixture tables (lineitem/orders/events/
  * documents) grow ~10× between sf0.01 and sf0.1 (embeddings 4×). A
  * LINEAR operator should show t-ratio ≲ data-ratio; at the small end
  * fixed per-job overhead dominates and ratios sit well BELOW the data
  * ratio, so the audit is one-sided: ratios well ABOVE it are the
  * anomalies — a super-linear join blow-up, an unblocked pair
  * generation, a driver-side loop whose rounds grow with data. Those
  * are exactly the shapes that do not survive a 100× scale-up, caught
  * by measurement instead of plan-reading.
  *
  * Usage: ScalingAudit [sfSmall] [sfBig] [query ...] (no names = all);
  * SPARK_GRAFT_REPS (default 3).
  * Prints one line per query sorted by descending ratio, then a
  * summary; exits 0 always (an instrument, not a gate).
  */
object ScalingAudit {
  def main(args: Array[String]): Unit = {
    val small = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val big = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        d: String): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, d).count() catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      ts.min
    }
    val only = args.drop(2).toSet
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .map { case (name, fn) =>
      val tS = time(fn, small)
      val tB = time(fn, big)
      (name, tS, tB, tB / tS)
    }
    val sorted = rows.sortBy(-_._4)
    println(f"${"query"}%-34s ${"t_small"}%8s ${"t_big"}%8s ratio")
    sorted.foreach { case (n, a, b, r) =>
      println(f"$n%-34s $a%8.3f $b%8.3f $r%6.2f")
    }
    val over = sorted.filter(_._4 > 10.0)
    println(f"\n${rows.size} queries; ${over.size} above the 10x big-table " +
      "data ratio" +
      (if (over.isEmpty) " - no super-linear scalers detected"
       else ": " + over.map(_._1).mkString(", ")))
    spark.stop()
  }
}
