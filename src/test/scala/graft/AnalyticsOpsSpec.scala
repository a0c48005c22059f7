package graft

import graft.operators.{AggOps, PipelineOps, SimOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable cases for the round-7 analytics additions: 3σ outlier
  * detection (integer-exact decision rule), the k-means cluster profile,
  * and the record-linkage entity pipeline (transitive closure across
  * deletion chains).
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("zscore outliers: flags exactly the planted spike, labeled hi") {
    import spark.implicits._
    // 30 values at 100.0 ± 1 and one spike at 1000: μ ≈ 129, σ ≈ 159,
    // 3σ band ≈ [−348, 606] — only the spike is outside, on the high side
    val vals = (1 to 30).map(i => (s"t", i.toLong, 100.0 + (i % 3 - 1))) :+
      (("t", 31L, 1000.0))
    val out = AggOps.zscoreOutliersOn(
      vals.toDF("event_type", "event_id", "value")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("event_id") === 31L)
    assert(out.head.getAs[String]("side") === "hi")
    assert(out.head.getAs[Int]("rank") === 1)
  }

  test("zscore outliers: a tight cluster with no spike flags nothing") {
    import spark.implicits._
    val vals = (1 to 20).map(i => ("t", i.toLong, 50.0 + (i % 5)))
    val out = AggOps.zscoreOutliersOn(
      vals.toDF("event_type", "event_id", "value"))
    assert(out.count() === 0)
  }

  test("kmeans profile partitions the whole corpus across the seed cells") {
    val prof = SimOps.kmeansProfile(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(prof.map(_.getAs[Long]("n_members")).sum === total,
      "every vector is assigned to exactly one cell")
    assert(prof.forall(r => r.getAs[Int]("cid") >= 0 &&
      r.getAs[Int]("cid") < 10), "cells are the 10 seed ids")
    assert(prof.forall(_.getAs[Long]("n_members") > 0))
  }

  test("linkage entities: deletion chains close transitively to one entity") {
    val ents = PipelineOps.linkageEntities(spark, sf).collect()
    assert(ents.nonEmpty)
    // canonical record is always a base row (ids < 1e6), every entity has
    // at least its planted variant, and every v2 (id ≥ 2e6) reached its
    // SOURCE through v1 — ed(source, v2) = 2, so membership of a base
    // canonical proves the transitive closure ran
    assert(ents.forall(_.getAs[Long]("cluster_id") < 1000000L))
    assert(ents.forall(_.getAs[Long]("n_members") >= 2))
    val chains = ents.filter(_.getAs[Long]("max_member") >= 2000000L)
    assert(chains.nonEmpty, "some entity contains a second-generation variant")
    assert(chains.forall(_.getAs[Long]("n_members") >= 3),
      "a v2 entity also holds the source and the v1 link")
  }
}
