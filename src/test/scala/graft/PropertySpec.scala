package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NativeExprs

/** Algebraic laws on generated data (SURVEY.md §5.2): the property-based
  * layer the reference never had. The native Catalyst expressions are
  * differentially tested against straightforward Scala reference
  * implementations on arbitrary inputs — the same role the DuckDB oracle
  * plays for the query layer. (scalacheck generators driven by a local
  * deterministic sampler — the scalatest bridge artifact isn't in the
  * offline cache.)
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def forAll[A](gen: Gen[A], reps: Int = 15)(f: A => Unit): Unit =
    (1 to reps).foreach(i => f(gen.pureApply(Gen.Parameters.default,
      Seed(i.toLong), 100)))

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 15).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(i.toLong), 100),
        gb.pureApply(Gen.Parameters.default, Seed(i.toLong + 1000), 100))
    }

  private val sortedDistinctLongs: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted)

  test("SortedLongIntersectCount equals reference set intersection size") {
    forAll(sortedDistinctLongs, sortedDistinctLongs) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val got = df.select(
        NativeExprs.sortedIntersectCount(spark, col("a"), col("b")))
        .head().getInt(0)
      assert(got === a.toSet.intersect(b.toSet).size)
    }
  }

  private val doubles: Gen[Seq[Double]] =
    Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0))

  test("FloatDotProduct equals left-to-right reference accumulation") {
    forAll(doubles, doubles) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val got = df.select(NativeExprs.dot(spark, col("a"), col("b")))
        .head().getDouble(0)
      var ref = 0.0
      a.zip(b).foreach { case (x, y) => ref += x * y }
      assert(got === ref) // bit-identical, not approximate
    }
  }

  test("SimHash63 equals reference bit-vote implementation") {
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      hs =>
        val got = Seq(Tuple1(hs)).toDF("h")
          .select(NativeExprs.simhash63(spark, col("h")))
          .head().getLong(0)
        val votes = new Array[Int](63)
        hs.foreach { h =>
          (0 until 63).foreach { j =>
            if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          }
        }
        val ref = (0 until 63).foldLeft(0L) { (acc, j) =>
          if (votes(j) > 0) acc | (1L << j) else acc
        }
        assert(got === ref)
    }
  }

  test("CountMinEstimateCount never underestimates and matches the Java probe") {
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val cms = words.stat.countMinSketch("word", 0.001, 0.99, 42)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val exact = words.groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).limit(50)
    val probed = exact.withColumn("est",
      NativeExprs.cmsEstimate(spark, lit(bos.toByteArray), col("word")))
      .collect()
    probed.foreach { r =>
      val (w, n, est) = (r.getAs[String]("word"), r.getAs[Long]("n"),
        r.getAs[Long]("est"))
      assert(est >= n, s"CMS underestimated '$w': $est < $n")
      assert(est === cms.estimateCount(w),
        s"codegen probe disagrees with Java API for '$w'")
    }
  }

  test("cosine is symmetric and bounded on real embeddings") {
    val e = Tables.embeddings(spark, sf).limit(30)
      .withColumn("nrm",
        sqrt(NativeExprs.dot(spark, col("embedding"), col("embedding"))))
    val a = e.select(col("vec_id").as("a"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    val pairs = a.crossJoin(b).filter(col("a") < col("b"))
      .select(
        (NativeExprs.dot(spark, col("ea"), col("eb")) /
          (col("na") * col("nb"))).as("ab"),
        (NativeExprs.dot(spark, col("eb"), col("ea")) /
          (col("nb") * col("na"))).as("ba"))
      .collect()
    pairs.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1), "cosine must be symmetric")
      assert(math.abs(r.getDouble(0)) <= 1.0 + 1e-9, "cosine must be bounded")
    }
  }

  test("exact dedup is idempotent") {
    val once = Tables.documents(spark, sf)
      .dropDuplicates("lang", "source")
    assert(once.count() === once.dropDuplicates("lang", "source").count())
  }

  test("grouped sum is partitioning-invariant (combiner law)") {
    forAll(Gen.chooseNum(1, 12)) { parts =>
      val base = Tables.events(spark, sf).select(col("user_id"), col("value"))
      val direct = base.groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("s"))
      val reparted = base.repartition(parts)
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("s"))
      assert(direct.exceptAll(reparted).count() === 0)
      assert(reparted.exceptAll(direct).count() === 0)
    }
  }

  test("mapreduce shim law: shim wordcount equals groupBy on random corpora") {
    val corpus: Gen[List[String]] = Gen.nonEmptyListOf(
      Gen.listOf(Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    forAll(corpus, 5) { lines =>
      val ds = lines.toDS().repartition(3)
      val mr = graft.api.MapReduce
        .mapReduce[String, String, Long, (String, Long)](
          ds,
          mapper = l => l.split(" ").iterator.filter(_.nonEmpty).map(_ -> 1L),
          reducer = (w, vs) => Iterator(w -> vs.sum),
          combiner = Some((_, vs) => Iterator(vs.sum)))
        .collect().toMap
      val expected = lines.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(mr === expected)
    }
  }

  test("clusterPairs labels every node with its component minimum") {
    val edges: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L)))
    forAll(edges, 5) { es =>
      val got = graft.operators.DedupOps
        .clusterPairsOn(es.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference union-find
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val comps = nodes.groupBy(find).flatMap { case (_, ns) =>
        val m = ns.min; ns.map(_ -> m)
      }
      assert(got === comps)
    }
  }

  test("CUSUM scan identity equals Page's recurrence on random series " +
      "(the stream_cusum / CusumProcessor equivalence, pre-reset)") {
    // S⁺ₙ = max(0, S⁺ₙ₋₁ + dₙ)  ⇔  S⁺ₙ = RSₙ − min(0, min_{k≤n} RS_k)
    // — the window formulation the batch query runs vs the sequential
    // recurrence the streaming processor runs (before its alarm reset)
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { _ =>
      val xs = List.fill(300)(rnd.nextInt(201).toLong) // values in [0,200]
      val (target, slack) = (100L, 10L)
      val dUp = xs.map(x => x - target - slack)
      val rec = dUp.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
      val rs = dUp.scanLeft(0L)(_ + _).tail
      val scan = rs.zipWithIndex.map { case (r, i) =>
        r - math.min(0L, rs.take(i + 1).min)
      }
      assert(rec === scan)
    }
  }

  test("star-contraction and min-label CC engines agree on random graphs") {
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { _ =>
      val es = List.fill(40)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      val star = graft.operators.DedupOps
        .clusterPairsOn(es.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prop = graft.operators.DedupOps
        .clusterPairsMinLabelOn(es.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star === prop)
    }
  }

  test("star contraction handles a 50-node chain the 20-round cap would kill") {
    // diameter 49: min-label propagation needs 49 rounds (> its 20 cap);
    // star contraction halves path lengths, so it converges well inside it
    val chain = (1L until 50L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = graft.operators.DedupOps.clusterPairsOn(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 50 && labels.values.forall(_ == 1L))
    // and the reference engine does throw on the same input at its cap,
    // documenting why the star engine is the default
    val e = intercept[IllegalStateException] {
      graft.operators.DedupOps.clusterPairsMinLabelOn(chain).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("minhash jaccard estimate tracks exact jaccard on random sets") {
    // signature agreement fraction estimates jaccard; with 32 perms the
    // absolute error is within ~0.35 at 99%+ for any pair — use a planted
    // high-overlap pair where the distinction matters
    val base = (1 to 200).map(i => s"tok$i")
    val aTokens = base
    val bTokens = base.take(180) ++ (1 to 20).map(i => s"other$i")
    val exactJ = aTokens.toSet.intersect(bTokens.toSet).size.toDouble /
      aTokens.toSet.union(bTokens.toSet).size
    val df = Seq(("a", aTokens.mkString(" ")), ("b", bTokens.mkString(" ")))
      .toDF("id", "text")
    val perms = graft.operators.DedupOps.perms
    val p = 2147483647L
    val sigs = df.select(col("id"),
      explode(expr(s"transform(split(text, ' '), t -> pmod(xxhash64(t), ${p}L))"))
        .as("h"))
      .groupBy(col("id"))
      .agg(perms.zipWithIndex.map { case ((pa, pb), i) =>
        min(pmod(col("h") * pa + pb, lit(p))).as(s"m$i")
      }.head, perms.zipWithIndex.tail.map { case ((pa, pb), i) =>
        min(pmod(col("h") * pa + pb, lit(p))).as(s"m$i")
      }: _*)
      .collect().map(r => r.getString(0) ->
        (0 until perms.size).map(i => r.getLong(i + 1))).toMap
    val agree = sigs("a").zip(sigs("b")).count { case (x, y) => x == y }
    val estimate = agree.toDouble / perms.size
    assert(math.abs(estimate - exactJ) < 0.3,
      s"minhash estimate $estimate vs exact $exactJ")
  }

  test("HLL inclusion-exclusion intersection tracks the exact overlap") {
    import graft.operators.AggOps
    val est = AggOps.hllIntersection(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(4).toDouble)).toMap
    val exact = AggOps.overlapMatrixOn(
        Tables.events(spark, "/root/testdata/sf0.001"), "user_id",
        "event_type")
      .filter(col("type_a") =!= col("type_b")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, truth) =>
      val e = est(k)
      // three lgK=12 HLL estimates (~1.6% sigma each) difference: allow
      // 10% of the truth plus a small absolute floor
      assert(math.abs(e - truth) <= 0.10 * truth + 30,
        s"pair $k: est $e vs exact $truth")
    }
  }

  test("KLL sketch: rank error bounded through the distributed UDAF") {
    import graft.functions.KllSketch
    val rnd = new scala.util.Random(7)
    val n = 60000
    // mixed distribution: uniform + a heavy spike (quantile stress case)
    val xs = Array.fill(n)(
      if (rnd.nextBoolean()) rnd.nextDouble() * 1000.0
      else 500.0 + rnd.nextGaussian())
    val qs = Array(0.1, 0.5, 0.9, 0.99)
    val agg = new KllSketch(512, qs)
    val est = spark.createDataset(xs.toSeq)(
        org.apache.spark.sql.Encoders.scalaDouble)
      .repartition(8).toDF("x")
      .agg(udaf(agg).apply(col("x"))).head().getSeq[Double](0)
    val sorted = xs.sorted
    def rankOf(v: Double): Int = {
      // count of items <= v via binary search on the sorted copy
      var lo = 0; var hi = sorted.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (sorted(mid) <= v) lo = mid + 1 else hi = mid
      }
      lo
    }
    qs.zip(est).foreach { case (q, e) =>
      assert(math.abs(rankOf(e) - q * n) <= KllSketch.rankEps * n + 1,
        s"q=$q est=$e rank=${rankOf(e)} target=${q * n}")
    }
  }

  test("KLL sketch: merge law, weight conservation, zero identity") {
    import graft.functions.KllSketch
    val rnd = new scala.util.Random(11)
    val n = 40000
    val xs = Array.fill(n)(rnd.nextDouble() * 100.0)
    val qs = Array(0.25, 0.5, 0.75)
    val agg = new KllSketch(512, qs)
    val sorted = xs.sorted
    def rankOf(v: Double): Int = sorted.count(_ <= v)
    // every split shape must stay within the same error budget
    Seq(1, n / 7, n / 3, n / 2, n - 1).foreach { cut =>
      val (l, r) = xs.splitAt(cut)
      val sl = l.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      val sr = r.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      val m = agg.merge(sl, sr)
      assert(m.n == n)
      val w = m.levels.zipWithIndex
        .map { case (a, i) => a.length.toLong << i }.sum
      assert(w == n, s"weight conservation broke at cut=$cut: $w != $n")
      agg.finish(m).zip(qs).foreach { case (e, q) =>
        assert(math.abs(rankOf(e) - q * n) <= KllSketch.rankEps * n + 1,
          s"cut=$cut q=$q est=$e rank=${rankOf(e)}")
      }
      // zero is a merge identity on content
      val mz = agg.merge(agg.zero, m)
      assert(mz.n == m.n &&
        mz.levels.map(_.length).sum == m.levels.map(_.length).sum)
    }
    // every level except a just-compacted remainder respects capacity
    val s1 = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    assert(s1.levels.forall(_.length <= 512 + 1))
  }

  test("ReservoirK: EXACT bottom-k under every merge tree, buffer bound, " +
      "zero identity") {
    import graft.functions.ReservoirK
    val rnd = new scala.util.Random(7)
    val k = 16
    val agg = new ReservoirK(k)
    val n = 5000
    // pseudorandom (priority, id) stream with duplicate priorities to
    // exercise the id tiebreak
    val xs = Array.fill(n)((rnd.nextInt(500).toLong, rnd.nextLong()))
    val want = xs.toVector.sorted.take(k)
    // unlike KLL's error budget, the reservoir's merge law is EXACT:
    // any split + merge order yields exactly the global bottom-k
    Seq(1, n / 7, n / 3, n / 2, n - 1).foreach { cut =>
      val (l, r) = xs.splitAt(cut)
      val sl = l.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      val sr = r.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      assert(agg.finish(agg.merge(sl, sr)) === want, s"cut=$cut")
      assert(agg.finish(agg.merge(sr, sl)) === want, s"swap cut=$cut")
      // zero is a merge identity
      assert(agg.finish(agg.merge(agg.zero, sl)) === agg.finish(sl))
      // the running buffer never exceeds the 2k trim bound
      assert(sl.items.length < 2 * k && sr.items.length < 2 * k)
    }
    // a 5-way merge tree (the shuffle's real shape) is also exact
    val parts = xs.grouped(n / 5 + 1).map(
      _.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))).toSeq
    assert(agg.finish(parts.reduce(agg.merge)) === want)
  }

  test("kll accuracy report: every cell within 10 permille of exact") {
    val rows = graft.operators.ReduceOps.kllAccuracy(spark, sf).collect()
    assert(rows.length === 9, "3 flags x 3 percentiles")
    assert(rows.map(r => (r.getString(0), r.getLong(1))).distinct.length
      === 9)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
      assert(r.getLong(4) <= 10L,
        s"KLL ${r.getString(0)}/p${r.getLong(1)} off by " +
          s"${r.getLong(4)} permille")
    }
  }

  test("shard rebalance: ring moves only onto the new shard, mod churns") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ids = (1L to 5000L).map(Tuple1(_)).toDF("id")
    // per-id placement under both rings — the defining consistent-hash
    // property: a row that moves when shard 17 joins moves TO shard 17
    val placed = ids
      .withColumn("p", expr("(id % 2147483647) * 1103515245 % 2147483647"))
      .withColumn("s16", expr(graft.operators.IoOps.ringCase(16, 8)))
      .withColumn("s17", expr(graft.operators.IoOps.ringCase(17, 8)))
      .collect().map(r => (r.getInt(2), r.getInt(3)))
    val moved = placed.filter { case (a, b) => a != b }
    assert(moved.nonEmpty, "the new shard must steal some arcs")
    assert(moved.forall(_._2 == 17),
      "every ring-moved row must land on the new shard")
    // the report: ring churn is a small fraction of mod churn
    val rep = graft.api.Graft.shardRebalance(ids, "id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep("mod")._1 === 5000L)
    assert(rep("ring")._2 === moved.length.toLong)
    assert(rep("mod")._3 > 800L, "mod placement churns nearly everything")
    assert(rep("ring")._3 < 200L, "ring churn stays near 1/n")
  }
}
