package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Semantic properties of the graph family beyond the DuckDB oracles:
  * planted-structure counts, rank-mass bounds, and skew-profile sanity.
  */
class GraphSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  test("triangle census finds at least the planted {orig,copy,trunc} triangles") {
    // docs divisible by 35 get BOTH an exact copy (+100000) and a truncated
    // near-dup (+200000); those three pairwise-similar docs are the only
    // densely-planted structure, so triangles ≥ count(doc_id % 35 == 0)
    val row = GraphOps.triangleCensus(spark, sf).head()
    val nDocs35 = Tables.documents(spark, sf)
      .filter(col("doc_id") % 35 === 0).count()
    val tri = row.getAs[Long]("n_triangles")
    assert(tri >= nDocs35, s"planted triangles missing: $tri < $nDocs35")
    // every triangle contributes 3 closed wedges; clustering ∈ (0, 1]
    val clustering = row.getAs[Double]("clustering")
    assert(clustering > 0.0 && clustering <= 1.0)
    assert(row.getAs[Long]("n_wedges") >= 3 * tri)
  }

  test("pagerank mass stays bounded and ranks are positive") {
    // fixed-point update only floors (never rounds up), so total mass can
    // only leak DOWN from N × 1e6; every rank stays ≥ the teleport floor
    val ranks = GraphOps.pageRank(spark, sf)
    val rows = ranks.collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getAs[Long]("rank_units") >= 150000L))
    // top-20 is sorted by rank desc with deterministic tiebreaks
    val units = rows.map(_.getAs[Long]("rank_units")).toSeq
    assert(units === units.sorted(Ordering[Long].reverse))
  }

  test("degree profile reflects the bipartite skew (suppliers ≫ customers)") {
    val prof = GraphOps.degreeProfile(spark, sf).collect()
      .map(r => r.getAs[String]("kind") -> r).toMap
    assert(prof.keySet === Set("customer", "supplier"))
    // far fewer suppliers than customers ⇒ supplier degrees dominate
    assert(prof("supplier").getAs[Double]("avg_deg") >
      prof("customer").getAs[Double]("avg_deg"))
    prof.values.foreach { r =>
      assert(r.getAs[Long]("min_deg") >= 1L)
      assert(r.getAs[Long]("max_deg") >= r.getAs[Long]("min_deg"))
    }
  }
}
