package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf experiments (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }
    }

    import graft.functions.NativeExprs
    val docs = graft.operators.DedupOps.withNearDupes(spark, d)
    val sh = docs.select(col("doc_id"), col("lang"), col("source"),
      array_sort(array_distinct(transform(graft.operators.TextOps.shingles3(
        graft.operators.TextOps.toks), xxhash64(_)))).as("sh"))
    val a = sh.select(col("doc_id").as("a"), col("lang"), col("source"),
      col("sh").as("sha"))
    val b = sh.select(col("doc_id").as("b"), col("lang"), col("source"),
      col("sh").as("shb"))
    val joined = a.join(b, Seq("lang", "source")).filter(col("a") < col("b"))

    time("sorted arrays build") { sh.agg(sum(size(col("sh")))).count() }
    time("join + native intersect") {
      joined.withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("sha"), col("shb")))
        .agg(sum(col("inter"))).count()
    }
    time("join + native intersect + jaccard filter") {
      joined.withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("sha"), col("shb")))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")))
        .filter(col("jaccard") >= 0.3).count()
    }
    time("filter after groupBy barrier") {
      joined.withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("sha"), col("shb")))
        .select(col("a"), col("b"), col("inter"),
          (size(col("sha")) + size(col("shb"))).as("tot"))
        .groupBy(col("a"), col("b"))
        .agg(first(col("inter")).as("inter"), first(col("tot")).as("tot"))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("tot") - col("inter")))
        .filter(col("jaccard") >= 0.3).count()
    }
    time("project inter only, no filter, count all pairs") {
      joined.withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("sha"), col("shb")))
        .select(col("a"), col("b"), col("inter")).count()
    }
    time("agg sum(inter) again") {
      joined.withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("sha"), col("shb")))
        .agg(sum(col("inter"))).count()
    }
    time("count pairs only") { joined.count() }
    time("filter on raw inter (no division)") {
      joined.withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("sha"), col("shb")))
        .filter(col("inter") >= 30).select(col("a"), col("b")).count()
    }
    time("agg sum of jaccard double") {
      joined.withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("sha"), col("shb")))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")))
        .agg(sum(col("jaccard"))).count()
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("agg sum(inter), wholeStage OFF") {
      joined.withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("sha"), col("shb")))
        .agg(sum(col("inter"))).count()
    }
    val shM = sh.repartition(col("lang"), col("source"))
    val aM = shM.select(col("doc_id").as("a"), col("lang"), col("source"),
      col("sh").as("sha"))
    val bM = shM.select(col("doc_id").as("b"), col("lang"), col("source"),
      col("sh").as("shb"))
    val joinedM = aM.join(bM, Seq("lang", "source")).filter(col("a") < col("b"))
    time("materialized arrays + filter on inter") {
      joinedM.withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("sha"), col("shb")))
        .filter(col("inter") >= 30).select(col("a"), col("b")).count()
    }
    time("materialized arrays + full jaccard") {
      joinedM.withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("sha"), col("shb")))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")))
        .filter(col("jaccard") >= 0.3)
        .select(col("a"), col("b"), col("jaccard"))
        .orderBy(col("a"), col("b")).count()
    }
    spark.stop()
  }
}
