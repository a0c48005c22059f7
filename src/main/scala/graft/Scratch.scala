package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratchpad main (not part of the library surface): currently probes
  * whether the fixed-point integer PageRank iteration reaches an EXACT
  * fixpoint (ranks identical between consecutive rounds) and after how many
  * rounds, at a given scale factor — the empirical question that decides
  * whether the convergent variant can carry a replayable DuckDB oracle.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e0 = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = e0.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(e0.select(col("s").as("src"), col("c").as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val withDeg = edges.join(deg, Seq("src")).repartition(col("src"))
      .localCheckpoint()
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("units"))
      .localCheckpoint()

    def l1(a: DataFrame, b: DataFrame): (Long, Long) = {
      val j = a.select(col("node"), col("units").as("ua"))
        .join(b.select(col("node"), col("units").as("ub")), Seq("node"), "full")
      val r = j.agg(
        sum(abs(coalesce(col("ua"), lit(0L)) - coalesce(col("ub"), lit(0L))))
          .as("l1"),
        count(lit(1)).as("n")).head()
      (r.getLong(0), r.getLong(1))
    }

    (1 to 40).foreach { round =>
      val next = withDeg.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("units DIV deg").as("contrib"))
        .groupBy(col("dst"))
        .agg(expr("150000L + (85L * sum(contrib)) DIV 100L").as("units"))
        .select(col("dst").as("node"), col("units"))
        .localCheckpoint()
      val (delta, n) = l1(next, ranks)
      println(s"[scratch] round $round: L1=$delta over $n nodes")
      ranks = next
      if (delta == 0L) {
        println(s"[scratch] EXACT fixpoint at round $round")
        spark.stop(); return
      }
    }
    println("[scratch] no exact fixpoint within 40 rounds")
    spark.stop()
  }
}
