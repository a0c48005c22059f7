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

  test("weighted pagerank: bounded, sorted, and actually uses the weights") {
    val w = GraphOps.pageRankWeighted(spark, sf).collect()
    assert(w.length === 20)
    assert(w.forall(_.getAs[Long]("rank_units") >= 150000L))
    val units = w.map(_.getAs[Long]("rank_units")).toSeq
    assert(units === units.sorted(Ordering[Long].reverse))
    // deterministic fixture: if the weighted top-20 ever equals the
    // unweighted one bit-for-bit, the weights were ignored
    val uw = GraphOps.pageRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val ww = w.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(uw !== ww)
  }

  test("converged pagerank matches a driver-side integer reference simulation") {
    // independent implementation of the SAME fixed-point contraction and
    // relative-L1 stop rule, in plain Scala over collected edges: integral
    // ops on positive longs are order-independent, so the distributed loop
    // must agree BIT-FOR-BIT, including the terminating round count
    val e0 = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = e0.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    // degree-proportional warm start, integral like the distributed init:
    // avg_deg = Σdeg DIV n (≥ 1), units₀ = deg·10⁶ DIV avg_deg
    val avgDeg = math.max(deg.values.sum / deg.size, 1L)
    var units = deg.map { case (n, dg) => n -> dg * 1000000L / avgDeg }
    def step(u: Map[Long, Long]): Map[Long, Long] = {
      val sums = new scala.collection.mutable.HashMap[Long, Long]()
        .withDefaultValue(0L)
      edges.foreach { case (src, dst) => sums(dst) += u(src) / deg(src) }
      u.keys.map(n => n -> (150000L + 85L * sums(n) / 100L)).toMap
    }
    var rounds = 0
    var converged = false
    while (!converged && rounds < 60) {
      // four rounds per convergence check, like the distributed loop
      val next = step(step(step(step(units))))
      val l1 = units.keys.iterator.map(n => math.abs(next(n) - units(n)))
        .map(BigInt(_)).sum
      val mass = units.values.iterator.map(BigInt(_)).sum
      converged = l1 * 100 <= mass // relTol = 0.01 without float rounding
      units = next
      rounds += 4
    }
    assert(converged, "reference simulation must converge within 60 rounds")
    val want = units.toSeq
      .map { case (n, u) =>
        (if (n % 2 == 0) "customer" else "supplier", n / 2, u) }
      .sortBy { case (k, id, u) => (-u, k, id) }
      .take(20)
      .map { case (k, id, u) => (k, id, u, rounds) }
    val got = GraphOps.pageRankConverged(spark, sf).collect().toSeq
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("entity_key"),
        r.getAs[Long]("rank_units"), r.getAs[Int]("rounds")))
    assert(got === want)
  }

  test("bfs hops histogram starts at the single source and covers reached nodes") {
    val rows = GraphOps.bfsHops(spark, sf).collect()
    val byHop = rows.map(r => r.getAs[Int]("hops") -> r.getAs[Long]("n_nodes")).toMap
    assert(byHop(0) === 1L, "exactly one source node at hop 0")
    // hops are contiguous from 0 (an empty BFS level ends the search)
    assert(byHop.keys.toSeq.sorted === (0 until byHop.size))
    assert(rows.map(_.getAs[Long]("n_nodes")).forall(_ >= 1L))
  }

  test("hyperANF: exact N(t) sequence and effective diameter on a path " +
      "(HLL coupon mode is exact at these cardinalities)") {
    import spark.implicits._
    // path 1-2-3-4-5: N(0)=5, N(1)=2+3·3... balls per node by radius:
    // t=1 (2,3,3,3,2)=13; t=2 (3,4,5,4,3)=19; t=3 (4,5,5,5,4)=23;
    // t=4 (5,5,5,5,5)=25 fixpoint. Effective diameter: smallest t with
    // N(t) ≥ 0.9·25 = 22.5 → t=3 (the true one is 4; 90% reach is the
    // published definition)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.hyperAnfOn(spark, edges, maxT = 10, lgK = 12)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.map(x => (x._1, x._2)).toSeq ===
      Seq((0, 5L), (1, 13L), (2, 19L), (3, 23L), (4, 25L), (5, 25L)))
    assert(got.filter(_._4).map(_._1).toSeq === Seq(3))
    // monotone non-decreasing reach (sketch union can only grow)
    assert(got.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    // deterministic across runs (DataSketches hashing is seeded-fixed)
    val again = GraphOps.hyperAnfOn(spark, edges, maxT = 10, lgK = 12)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(again.toSeq === got.map(x => (x._1, x._2)).toSeq)
  }

  test("hyperANF fixture report is a build-once artifact: re-run attaches") {
    val h0 = graft.operators.ArtifactCache.hits.get()
    def run() = GraphOps.hyperAnf(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    val first = run()
    val second = run()
    // parquet round-trips the report exactly, so attach ≡ fresh build
    assert(second === first)
    assert(second.map(_._1) === second.map(_._1).sorted,
      "attached report must come back ordered by t")
    assert(graft.operators.ArtifactCache.hits.get() > h0,
      "second invocation must re-attach the persisted N(t) report")
  }

  test("weighted sssp relaxation matches hand-computed shortest paths") {
    import spark.implicits._
    // cheapest path to node 2 takes MORE hops than the direct edge
    // (1→3→4→2 costs 3 vs direct 10), and node 5 is unreachable — the two
    // behaviors that separate weighted SSSP from BFS hop counting
    val edges = Seq(
      (1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L), (4L, 2L, 1L),
      (5L, 5L, 1L) // disconnected self-loop keeps node 5 in the id space
    ).toDF("src", "dst", "w")
    def distMap(maxHops: Int): Map[Long, Long] =
      GraphOps.ssspFrom(edges, maxHops).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distMap(4) === Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 2L))
    // the hop cap is part of the semantics: within 1 hop the direct edge
    // is the only route to node 2; within 2 the relaxation reaches node 4
    assert(distMap(1) === Map(1L -> 0L, 2L -> 10L, 3L -> 1L))
    assert(distMap(2) === Map(1L -> 0L, 2L -> 10L, 3L -> 1L, 4L -> 2L))
  }

  test("sync label propagation recovers two bridged triangle communities") {
    import spark.implicits._
    // triangle cliques {1,2,3} and {4,5,6} joined by bridge (3,4): after
    // 3 sync min-tiebreak rounds the cliques carry distinct labels
    // (hand-simulated: {1,2,3}→1, {4,5,6}→3)
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.labelPropFrom(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("3-truss keeps exactly the triangle on a triangle-with-tail graph") {
    import spark.implicits._
    // triangle {1,2,3} + pendant path 3-4-5: every non-triangle edge has
    // zero support and is peeled; the triangle survives intact
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val truss = GraphOps.trussFrom(edges, 3, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truss === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // square-with-diagonal: both triangles share the diagonal, all five
    // edges carry support >= 1, nothing peels
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("a", "b")
    val t2 = GraphOps.trussFrom(square, 3, 3).count()
    assert(t2 === 5L)
  }

  test("3-truss peels a hub star cleanly (star-plus-triangle, no hub blow-up)") {
    import spark.implicits._
    // hub 1 wired to 50 leaves (zero triangles — high degree is NOT
    // cohesion) plus a disjoint triangle {100,101,102}: the degree-
    // oriented support pass must peel every star edge in round 1 and keep
    // exactly the triangle. This is the shape where an id-sorted
    // orientation would enumerate O(hub²) wedges.
    val star = (10L to 59L).map(l => (1L, l))
    val edges =
      (star ++ Seq((100L, 101L), (100L, 102L), (101L, 102L))).toDF("a", "b")
    val truss = GraphOps.trussFrom(edges, 3, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truss === Set((100L, 101L), (100L, 102L), (101L, 102L)))
  }

  test("degree-oriented triangle enumeration lists each triangle exactly once") {
    import spark.implicits._
    // square-with-diagonal 1-3: exactly the triangles {1,2,3} and {1,3,4}
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("a", "b")
    val tri = GraphOps.degreeOrientedTriangles(square).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(tri.sorted === Seq((1L, 2L, 3L), (1L, 3L, 4L)))
    // K4: all four id-sorted triples, none doubled
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val t4 = GraphOps.degreeOrientedTriangles(k4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(t4.sorted === Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L)))
  }

  test("local clustering coefficient matches hand values on a tailed triangle") {
    import spark.implicits._
    // triangle {1,2,3} + tail 3-4 + wedge 7-8, 8-9 (+ isolated edge 5-6):
    // cc(1)=cc(2)=1 (deg 2), cc(3)=2·1/(3·2)=1/3, cc(8)=0 (open wedge);
    // deg-1 nodes 4,5,6,7,9 are excluded
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L),
      (7L, 8L), (8L, 9L)).toDF("a", "b")
    val out = GraphOps.clusteringCoeffOn(und).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("deg"),
        r.getAs[Long]("n_tri"), r.getAs[Double]("local_cc")))
    assert(out.toSeq === Seq((1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 2.0 / 6.0), (8L, 2L, 0L, 0.0)))
  }

  test("registered 3-truss covers at least the planted triangle structure") {
    val row = GraphOps.kTruss(spark, sf).head()
    val nDocs35 = Tables.documents(spark, sf)
      .filter(col("doc_id") % 35 === 0).count()
    assert(row.getAs[Long]("n_edges") >= 3 * nDocs35)
    assert(row.getAs[Long]("n_nodes") >= 3 * nDocs35)
  }

  test("k-core peel cascades to the exact core on a cycle-with-tail graph") {
    import spark.implicits._
    // cycle 1..5 with a pendant path 5-6-7-8: the 2-core is exactly the
    // cycle, and reaching it takes a 3-deep peel cascade (8, then 7,
    // then 6) — the behavior a single degree filter would get wrong
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L),
      (5L, 6L), (6L, 7L), (7L, 8L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val core = GraphOps.kCoreFrom(edges, 2, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
  }

  test("registered k-core round count reaches the true fixpoint at sf0.001") {
    // driver-side reference peels WITHOUT a round bound; the registered
    // 4-round peel must land on the same core (bipartite cascades are
    // shallow — customers only neighbor suppliers)
    val pairs = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    var es: Set[(Long, Long)] = pairs.flatMap { case (c, s) =>
      Seq((c, s), (s, c)) }.toSet
    var changed = true
    while (changed) {
      val deg = es.groupBy(_._1).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= GraphOps.KCoreK).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != es.size
      es = next
    }
    val expect = es.groupBy(_._1).map { case (n, xs) => n -> xs.size.toLong }
    import spark.implicits._
    val df = pairs.toSeq.flatMap { case (c, s) => Seq((c, s), (s, c)) }
      .toDF("src", "dst")
    val got = GraphOps.kCoreFrom(df, GraphOps.KCoreK, GraphOps.KCoreRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    assert(got.nonEmpty && got.values.min >= GraphOps.KCoreK)
  }

  test("harmonic centrality matches hand-computed landmark sums on a path") {
    import spark.implicits._
    // path 1-2-3-4-5, landmarks = 2 smallest ids {1, 2}: units are
    // Σ 10⁶ DIV d over dist > 0, n_lm counts reaching landmarks
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.harmonicFrom(edges, 2, 6).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(
      1L -> (1000000L, 1L),               // lm2 at d=1 (lm1 self filtered)
      2L -> (1000000L, 1L),               // lm1 at d=1
      3L -> (1500000L, 2L),               // 10⁶/1 + 10⁶/2
      4L -> (833333L, 2L),                // 10⁶/2 + 10⁶ DIV 3
      5L -> (583333L, 2L)))               // 10⁶/4 + 10⁶ DIV 3
    // the hop cap is part of the semantics: at maxHops=2 node 5 is
    // unreachable from both landmarks and drops out entirely
    val capped = GraphOps.harmonicFrom(edges, 2, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!capped.contains(5L))
    assert(capped(4L) === (500000L, 1L)) // only lm2 at d=2

    // disconnection is handled gracefully (the reason harmonic over
    // closeness): an unreachable component contributes nothing and its
    // nodes score only from landmarks inside it
    val two = Seq((1L, 2L), (10L, 11L)) // landmarks {1, 2} both left
    val edges2 = (two ++ two.map(_.swap)).toDF("src", "dst")
    val got2 = GraphOps.harmonicFrom(edges2, 2, 6).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got2 === Map(1L -> (1000000L, 1L), 2L -> (1000000L, 1L)))
  }

  test("betweenness matches a manual Brandes run on a path graph") {
    import spark.implicits._
    // path 1-2-3-4-5, landmarks {1, 2}, depth 4. Hand Brandes in
    // micro-units (δ(u) += (σu·(10⁶+δv)) DIV σv, all σ = 1 on a path):
    //   source 1: levels 1→2→3→4→5; δ(4)=10⁶, δ(3)=2·10⁶, δ(2)=3·10⁶
    //             (node 5 sits AT the hop-4 horizon: δ = 0 and excluded)
    //   source 2: levels 2→{1,3}→4→5; δ(4)=10⁶, δ(3)=2·10⁶, δ(1)=0,
    //             δ(5)=0 at interior level 3 → a zero row, kept
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.betweennessFrom(edges, 2, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 0L,         // leaf: on nobody's shortest paths
      2L -> 3000000L,   // carries 1's traffic to 3, 4 (5 is horizon-cut)
      3L -> 4000000L,   // the middle: both sources route through it
      4L -> 2000000L,
      5L -> 0L))        // leaf at source 2's interior level 3
    // split path counting: diamond 1-2-4, 1-3-4 (two equal shortest
    // 1→4 paths) with tail 4-5; landmark {1} only, depth 3.
    //   σ(2)=σ(3)=1, σ(4)=2, σ(5)=2; δ(4)=(2·10⁶)DIV 2=10⁶ from 5's base
    //   δ(2)=δ(3)=(1·(10⁶+10⁶))DIV 2 = 10⁶ — the σ-ratio split
    val dia = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val dedges = (dia ++ dia.map(_.swap)).toDF("src", "dst")
    val got2 = GraphOps.betweennessFrom(dedges, 1, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === Map(2L -> 1000000L, 3L -> 1000000L, 4L -> 1000000L))
  }

  test("public centrality knobs: Graft.harmonic/betweennessCentrality " +
      "equal the cores and the est column applies the n/L inflation") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val harmCore = GraphOps.harmonicFrom(edges, 2, 6).collect()
      .map(_.toSeq).toSet
    val harmApi = graft.api.Graft
      .harmonicCentrality(edges, nLandmarks = 2, maxHops = 6).collect()
      .map(_.toSeq).toSet
    assert(harmApi === harmCore)
    // renamed columns route through srcCol/dstCol
    val renamed = graft.api.Graft.harmonicCentrality(
      edges.select(col("src").as("a"), col("dst").as("b")),
      srcCol = "a", dstCol = "b", nLandmarks = 2, maxHops = 6).collect()
      .map(_.toSeq).toSet
    assert(renamed === harmCore)
    val betwCore = GraphOps.betweennessFrom(edges, 2, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val betwApi = graft.api.Graft
      .betweennessCentrality(edges, nLandmarks = 2, maxDepth = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(betwApi.view.mapValues(_._1).toMap === betwCore)
    // est = (units · n) DIV min(L, n): n = 5 nodes, L = 2
    betwApi.foreach { case (_, (units, est)) =>
      assert(est === units * 5L / 2L)
    }
  }

  test("public pageRank/labelPropagate knobs: API equals the cores at " +
      "the fixture constants; damping 0 collapses to pure teleport") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val api = graft.api.Graft.pageRank(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val core = GraphOps.pageRankFrom(edges, 850L, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(api === core)
    // damping 0: the update is teleport-only — every reached node holds
    // exactly 10⁶ micro-units after any number of rounds
    val tele = graft.api.Graft
      .pageRank(edges, dampingPermille = 0L, iters = 3).collect()
    assert(tele.nonEmpty && tele.forall(_.getLong(1) === 1000000L))
    // damping 1000: no teleport — floors only ever LOSE mass
    val full = graft.api.Graft
      .pageRank(edges, dampingPermille = 1000L, iters = 3).collect()
    assert(full.map(_.getLong(1)).sum <= 5L * 1000000L)
    // labelPropagate ≡ the core at the same round count
    val lpApi = graft.api.Graft.labelPropagate(edges, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lpCore = GraphOps.labelPropFrom(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpApi === lpCore)
  }

  test("landmark sweep: L >= n collapses to the exact baseline (err 0, " +
      "full top-20 overlap) and the L grid is ascending") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    Seq(
      graft.api.Graft.betweennessLandmarkSweep(edges, ls = Seq(2, 8),
        maxDepth = 4),
      graft.api.Graft.harmonicLandmarkSweep(edges, ls = Seq(2, 8),
        maxHops = 6)).foreach { rep =>
      val rows = rep.collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 8L))
      val all = rows.last // L = 8 > n = 5 ⇒ every node is a landmark
      assert(all.getAs[Long]("n_nodes") === 5L)
      assert(all.getAs[Long]("err_units_top20") === 0L)
      assert(all.getAs[Long]("err_permille") === 0L)
      // est ≡ exact ⇒ identical ranking ⇒ overlap = |exact top-20| = n
      assert(all.getAs[Long]("top20_overlap") === 5L)
      // the L = 2 estimate scores only landmark-observed paths: its
      // error is measured, not asserted — but the exact mass is shared
      assert(rows.head.getAs[Long]("exact_units_top20") ===
        all.getAs[Long]("exact_units_top20"))
    }
  }

  test("assortativity: bipartite graph is strongly disassortative") {
    val row = GraphOps.assortativity(spark, sf).head()
    val r = row.getAs[Double]("assortativity")
    // customers only wire to suppliers (hub side), so endpoint degrees
    // anti-correlate almost perfectly
    assert(r < -0.9 && r >= -1.0, s"bipartite r should approach -1, got $r")
    assert(row.getAs[Long]("m") > 0)
  }

  test("modularity profile matches hand math on two bridged triangles") {
    import TestSpark.spark.implicits._
    // triangles {1,2,3} and {4,5,6} + bridge 3–4; labels = the triangles
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L).toDF("node", "lbl")
    val got = graft.api.Graft.modularityProfile(sym, labels).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // m = 7; each triangle: 3 nodes, deg_sum = 2+2+3 = 7, e_in = 3,
    // q_part = 3/7 − (7/14)² — the same IEEE op order as the engine
    val q = 3.0 / 7 - (7.0 / 14) * (7.0 / 14)
    assert(got === Map(1L -> ((3L, 7L, 3L, q)), 4L -> ((3L, 7L, 3L, q))))
  }

  test("link prediction matches hand math on a tiny bipartite incidence") {
    import TestSpark.spark.implicits._
    // customers c1..c4 × suppliers A,B,C; c4 is an A-only singleton
    val inc = Seq(("c1", "A"), ("c1", "B"), ("c2", "A"), ("c2", "B"),
      ("c3", "B"), ("c3", "C"), ("c4", "A")).toDF("cust", "supp")
    val got = graft.api.Graft.linkPrediction(inc, "cust", "supp")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4))))
    // (A,B): shared c1,c2 (deg 2 each) → cn=2, ra=2·(1e12 div 2)=1e12,
    //        jaccard = 2/(3+3−2); (B,C): shared c3 → ra=5e11, j=1/(3+1−1)
    assert(got.toSeq === Seq(
      ("A", "B") -> ((2L, 1000000000000L, 2.0 / 4)),
      ("B", "C") -> ((1L, 500000000000L, 1.0 / 3))))
    // a via-degree cap of 1 keeps only c4, which has a single supplier:
    // no pair can be generated through a capped-out hub
    assert(graft.api.Graft.linkPrediction(inc, "cust", "supp",
      maxViaDegree = 1).count() === 0L)
  }

  test("link prediction hub cap bounds pair generation: a 500-supplier " +
      "hub contributes nothing; a cap-boundary customer contributes " +
      "exactly C(64,2)") {
    import TestSpark.spark.implicits._
    // hub customer "h" touches 500 suppliers (would alone emit ~125k
    // pairs); customer "c" touches exactly 64 (the inclusive cap) — the
    // only pairs that may exist are c's C(64,2) = 2016
    val inc = ((0 until 500).map(i => ("h", s"s$i"))
      ++ (0 until 64).map(i => ("c", s"s$i"))).toDF("cust", "supp")
    val scored = graft.api.Graft.linkPrediction(inc, "cust", "supp",
      maxViaDegree = 64, k = 5000)
    assert(scored.count() === 64L * 63 / 2,
      "pair volume must be exactly the capped customer's C(64,2)")
    // every surviving pair rode the single shared capped customer
    val one = scored.collect()
    assert(one.forall(_.getAs[Long]("cn") === 1L))
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
