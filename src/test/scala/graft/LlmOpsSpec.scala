package graft

import graft.operators.{DedupOps, SimOps, AggOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the probabilistic LLM-pipeline operators that cannot be
  * hash-checked against the DuckDB oracle (engine-specific hashing or
  * reduction-order-sensitive floats): MinHash-LSH recall, SimHash locality,
  * IVF-ANN recall vs exact, HLL accuracy vs exact distinct.
  */
class LlmOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def plantedFound(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val planted = df.filter(col("b") === col("a") + 200000).count()
    val expected = TestSpark.spark.read
      .parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 7 === 0).count()
    (planted, expected)
  }

  test("LOF: driver-side brute-force replay matches the engine bit-for-bit") {
    import spark.implicits._
    // seeded random corpus, k=3, ALL rows returned — replicate the
    // exact quantized algebra (left-to-right double dots, (dist, nid)
    // tie-break, floor·1e9 reachability, floor·1e6 lrd) in plain Scala
    // and demand bit equality on every column.
    val rng = new scala.util.Random(7)
    val nV = 40; val dim = 8; val k = 3
    val vecs = Array.fill(nV)(Array.fill(dim)(rng.nextFloat() * 2 - 1))
    val df = vecs.zipWithIndex.map { case (v, i) =>
      (i.toLong, i % 4, v.toSeq) }.toSeq
      .toDF("vec_id", "label", "embedding")
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val nrm = vecs.map(v => math.sqrt(dot(v, v)))
    def dst(i: Int, j: Int): Double =
      1.0 - dot(vecs(i), vecs(j)) / (nrm(i) * nrm(j))
    val knn = (0 until nV).map { q =>
      (0 until nV).filter(_ != q).map(n => (dst(q, n), n))
        .sortBy { case (dd, n) => (dd, n) }.take(k)
    }
    val kdist = knn.map(_.map(_._1).max)
    val srd = (0 until nV).map { q =>
      knn(q).map { case (dd, n) =>
        math.floor(math.max(kdist(n), dd) * 1e9).toLong }.sum
    }
    val lu = srd.map(s0 =>
      math.floor(k.toDouble * 1e9 / s0.toDouble * 1000000).toLong)
    val lof = (0 until nV).map { q =>
      val slu = knn(q).map { case (_, n) => lu(n) }.sum
      slu.toDouble / k / lu(q).toDouble
    }
    val want = (0 until nV)
      .map(q => (q.toLong, q % 4, kdist(q), lu(q), lof(q)))
      .sortBy { case (id, _, _, _, l) => (-l, id) }
    val got = graft.api.Graft.lofOutliers(spark, df, k = 3, topN = 40)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq === want)
    // semantic sanity: every LOF is positive and most mass sits near 1
    assert(lof.forall(_ > 0))
  }

  test("IVF-shortlist LOF: scores deviate mildly from exact, deterministic") {
    // the shortlist truncates each point's candidate pool to its 2
    // probed cells; on this corpus the measured full-corpus score
    // perturbation is max ≈ 0.051 / mean ≈ 0.0075 — the spec pins
    // generous ceilings so a broken shortlist (empty cells, wrong
    // routing) fails loudly while honest jitter passes.
    val exact = SimOps.lofOn(spark,
        Tables.embeddings(spark, sf), k = 10, topN = 1000000)
      .collect().filter(!_.isNullAt(4))
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    def run() = SimOps.lofIvf(spark, sf, topN = 1000000).collect()
      .filter(!_.isNullAt(4)).map(r => (r.getLong(0), r.getDouble(4)))
    val ivf = run()
    assert(run().toSeq === ivf.toSeq, "shortlist LOF must be deterministic")
    assert(ivf.length === exact.size)
    val devs = ivf.map { case (id, l) => math.abs(l - exact(id)) }
    val (mx, mean) = (devs.max, devs.sum / devs.size)
    info(f"shortlist-vs-exact LOF deviation: max $mx%.4f mean $mean%.4f " +
      s"over ${devs.length} points")
    assert(mx <= 0.15, f"max deviation $mx%.4f")
    assert(mean <= 0.03, f"mean deviation $mean%.4f")
  }

  test("sqrtNlist policy: ceil(sqrt(n)), floor 1") {
    assert(SimOps.sqrtNlist(0) === 1)
    assert(SimOps.sqrtNlist(1) === 1)
    assert(SimOps.sqrtNlist(2) === 2)
    assert(SimOps.sqrtNlist(100) === 10)
    assert(SimOps.sqrtNlist(101) === 11)
    assert(SimOps.sqrtNlist(500) === 23) // the fixture corpus at sf0.001
    assert(SimOps.sqrtNlist(2000) === 45) // ... at sf0.1
  }

  test("scaled IVF twins: √n index keeps recall and LOF deviation bounded") {
    // sim_knn_ivf_scaled: same queries/k as exact, ≥60% top-5 recall on
    // this corpus even with 23 cells (measured 940‰ at nlist=10,
    // 880‰ at nlist=40 on sf0.1)
    val exact = SimOps.knnExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val scaled = SimOps.knnIvfScaled(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(scaled.length === exact.size)
    val rec = scaled.count(exact.contains) * 1000 / exact.size
    info(s"sim_knn_ivf_scaled recall@5: $rec permille")
    assert(rec >= 600, s"scaled-IVF recall collapsed: $rec permille")
    // sim_lof_ivf_scaled: deterministic and inside the same generous
    // deviation ceiling the pinned-nlist shortlist is held to
    val ex = SimOps.lofOn(spark, Tables.embeddings(spark, sf),
        k = 10, topN = 1000000)
      .collect().filter(!_.isNullAt(4))
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val devs = SimOps.lofIvfCells(spark,
        SimOps.lloydCells(spark, sf, SimOps.sqrtNlist(500)),
        k = 10, nprobe = 2)
      .collect().filter(!_.isNullAt(3))
      .map(r => math.abs(r.getDouble(3) - ex(r.getLong(0))))
    // ≥95% coverage: a √n cell could in principle be a singleton, but a
    // broken index (mass NULLs) must fail loudly
    assert(devs.length * 100 >= ex.size * 95)
    val (mx, mean) = (devs.max, devs.sum / devs.size)
    info(f"√n-shortlist LOF deviation: max $mx%.4f mean $mean%.4f")
    assert(mx <= 0.2, f"max deviation $mx%.4f")
    assert(mean <= 0.03, f"mean deviation $mean%.4f")
  }

  test("ivfNlistReport cross-checks its own legs and stays bounded") {
    val rows = SimOps.ivfNlistReport(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(10, 20, 40))
    // independent replay of the nlist=10 row's knn_hits from the two
    // registered queries it claims to intersect
    val exact = SimOps.knnExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf10 = SimOps.knnIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val want10 = ivf10.count(exact.contains).toLong
    val r10 = rows.find(_.getInt(0) === 10).get
    assert(r10.getLong(1) === want10)
    assert(r10.getLong(2) === exact.size.toLong)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2)) // hits ≤ exact
      val rec = r.getLong(3)
      assert(rec >= 0 && rec <= 1000)
      assert(r.getLong(4) > 0) // lof_n_both
      assert(r.getLong(5) >= 0 && r.getLong(6) >= 0)
      // mean deviation in micro-units stays under the 0.03 spec bound
      assert(r.getLong(6) / r.getLong(4) <= 30000,
        s"nlist=${r.getInt(0)} mean dev ${r.getLong(6) / r.getLong(4)}u")
    }
  }

  test("Graft.knnIvf public API: √n default equals brute force on a " +
      "separable corpus, pinned nlist equals the registered query") {
    import spark.implicits._
    // four tight clusters: every query's exact top-k sits in its own
    // cluster, and the home cell is always probed → ANN ≡ exact
    val rng = new scala.util.Random(11)
    val centers = Array.tabulate(4, 8)((c, j) =>
      math.sin(c * 31.0 + j * 3.0))
    val vecs = Array.tabulate(36) { i =>
      val c = i % 4
      centers(c).map(x => (x + rng.nextGaussian() * 0.01).toFloat)
    }
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq.toDF("id", "vec")
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val nrm = vecs.map(v => math.sqrt(dot(v, v)))
    val want = (0 until 3).flatMap { q =>
      (0 until 36).filter(_ != q)
        .map(n => (dot(vecs(q), vecs(n)) / (nrm(q) * nrm(n)), n))
        .sortBy { case (c, n) => (-c, n) }.take(3).zipWithIndex
        .map { case ((_, n), r) => (q.toLong, r + 1, n.toLong) }
    }
    val got = graft.api.Graft.knnIvf(df, "id", "vec",
        col("vec_id") < 3, k = 3) // nlist defaults to ⌈√36⌉ = 6
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq === want)
    // pinned nlist=10 on the fixture corpus ≡ the registered sim_knn_ivf
    val pub = graft.api.Graft.knnIvf(Tables.embeddings(spark, sf),
        "vec_id", "embedding", col("vec_id") < 10, nlist = 10)
      .collect().map(_.toSeq)
    val reg = SimOps.knnIvf(spark, sf).collect().map(_.toSeq)
    assert(pub.toSeq === reg.toSeq)
  }

  test("Graft.lofIvf public API: pinned nlist equals the registered " +
      "sim_lof_ivf; √n default equals sim_lof_ivf_scaled") {
    val emb = Tables.embeddings(spark, sf)
    val pinned = graft.api.Graft.lofIvf(emb, nlist = 10)
      .collect().map(_.toSeq)
    assert(pinned.toSeq === SimOps.lofIvf(spark, sf).collect()
      .map(_.toSeq).toSeq)
    val scaled = graft.api.Graft.lofIvf(emb)
      .collect().map(_.toSeq)
    assert(scaled.toSeq === SimOps.lofIvfScaled(spark, sf).collect()
      .map(_.toSeq).toSeq)
    // column-name parameters (r15 advice): renamed frame, same result
    val renamed = graft.api.Graft.lofIvf(
      emb.select(col("vec_id").as("id"), col("label").as("cat"),
        col("embedding").as("vec")),
      nlist = 10, idCol = "id", vecCol = "vec", labelCol = "cat")
      .collect().map(_.toSeq)
    assert(renamed.toSeq === pinned.toSeq)
  }

  test("dedup recall report: control row reads 1000/1000, permilles bounded, " +
      "and the minhash leg's recall matches its pair query") {
    val rows = DedupOps.recallReport(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(rows.keySet === Set("exact_prefix", "minhash_lsh",
      "minhash_mllib", "simhash", "simhash_sorted"))
    // internal control: the exact table against itself is perfect
    val (ed, eh, en, er, ep) = rows("exact_prefix")
    assert(ed === en && eh === en && er === 1000L && ep === 1000L)
    rows.values.foreach { case (det, hits, nEx, rec, prec) =>
      assert(nEx === en) // one shared denominator
      assert(hits <= det && hits <= nEx)
      assert(rec >= 0L && rec <= 1000L && prec >= 0L && prec <= 1000L)
    }
    // the lsh leg τ-verifies its candidates, but UNBLOCKED — it may
    // legitimately claim cross-(lang, source) pairs the blocked exact
    // table excludes by contract (measured here: precision < 1000 is
    // the blocking delta, not hash error), while still recovering most
    // of the blocked truth
    val (_, lh, _, lrec, _) = rows("minhash_lsh")
    assert(lh > 0L && lrec >= 500L,
      s"minhash_lsh recall collapsed: $lrec permille")
  }

  test("minhash LSH recovers nearly all planted truncation near-dups") {
    val (found, expected) = plantedFound(DedupOps.minhashLsh(spark, sf))
    assert(expected > 0)
    // truncation keeps shingle-jaccard ≈ 0.85 ⇒ ≥ 0.99 per-band-family
    // hit probability with 8 bands × 4 rows; allow a small deterministic miss
    assert(found >= (expected * 0.9).toLong,
      s"minhash found $found of $expected planted near-dup pairs")
  }

  test("minhash subsumes the blocked jaccard pairs within blocks") {
    // every (lang,source)-blocked jaccard≥0.3 pair LSH finds is genuine:
    // verify jaccard column is ≥ 0.3 and pairs are distinct
    val out = DedupOps.minhashLsh(spark, sf)
    assert(out.filter(col("jaccard") < 0.3).count() === 0)
    assert(out.count() === out.select(col("a"), col("b")).distinct().count())
  }

  test("mllib MinHashLSH agrees with the hand-rolled pipeline") {
    val hand = DedupOps.minhashLsh(spark, sf)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val packaged = DedupOps.minhashMllib(spark, sf)
      .filter(col("jdist") <= 0.7) // jaccard >= 0.3, same bar as hand-rolled
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // both are probabilistic candidate generators over the same exact
    // similarity — require strong (not perfect) overlap
    val inter = hand.intersect(packaged).size.toDouble
    assert(inter / hand.size >= 0.7,
      s"mllib found ${inter.toInt} of ${hand.size} hand-rolled pairs")
  }

  test("shinglesN on docs shorter than n yields empty arrays, not a crash") {
    import TestSpark.spark.implicits._
    val docs = Seq((1L, "just four tiny words"), (2L, "ab"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val sh5 = docs.select(col("doc_id"),
      graft.operators.TextOps.shinglesN(split(col("text"), " "), 5).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh5(1L).isEmpty, "4-token doc has no 5-gram")
    assert(sh5(2L).isEmpty, "1-token doc has no 5-gram")
    assert(sh5(3L) === Seq("one two three four five", "two three four five six",
      "three four five six seven"))
  }

  test("simhash of identical text is identical (hamming 0)") {
    val docs = TestSpark.spark.read.parquet(s"$sf/documents.parquet")
    val copies = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 100000).as("doc_id"),
        col("text")))
    val sig = DedupOps.simhashSigs(copies)
    val joined = sig.as("x").join(sig.as("y"),
      col("x.doc_id") + 100000 === col("y.doc_id"))
    assert(joined.count() === docs.count())
    assert(joined.filter(col("x.simhash") =!= col("y.simhash")).count() === 0)
  }

  test("simhash sort-neighborhood pairs are genuine and find exact dupes") {
    val sorted = DedupOps.simhashSorted(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every emitted pair's hamming must be correct vs the raw signatures
    val sigs = DedupOps.simhashSigs(
        graft.operators.DedupOps.withNearDupes(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sorted.foreach { case (a, b, h) =>
      assert(java.lang.Long.bitCount(sigs(a) ^ sigs(b)) === h, s"pair ($a,$b)")
      assert(h <= 6)
    }
    // withNearDupes plants truncated copies at id+200000 whose signatures
    // are hamming-close to the original — sort-adjacency must recover a
    // healthy share of them
    val planted = sorted.count { case (a, b, _) => b == a + 200000 }
    assert(planted >= 10, s"only $planted planted near-dup pairs recovered")
  }

  test("simhash: planted near-dups are closer than background pairs") {
    val corpus = DedupOps.withNearDupes(spark, sf)
    val sigs = DedupOps.simhashSigs(corpus)
    val a = sigs.select(col("doc_id").as("a"), col("simhash").as("ha"))
    val b = sigs.select(col("doc_id").as("b"), col("simhash").as("hb"))
    val ham = a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .withColumn("is_planted", (col("b") === col("a") + 200000).cast("int"))
    val rows = ham.groupBy(col("is_planted"))
      .agg(avg(col("hamming")).as("mean_ham")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(rows(1) < rows(0) / 2,
      s"planted mean hamming ${rows(1)} not well below background ${rows(0)}")
  }

  test("IVF ANN recall beats random guessing by a wide margin") {
    val exact = SimOps.knnExact(spark, sf)
      .select(col("qid"), col("nid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivf = SimOps.knnIvf(spark, sf)
      .select(col("qid"), col("nid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, ns) =>
      ivf.getOrElse(q, Set.empty).intersect(ns).size.toDouble / ns.size
    }
    val mean = recalls.sum / recalls.size
    // labels are random classes over near-orthogonal vectors, so absolute
    // recall is bounded by the data; random guessing would be ~5/500 ≈ 0.01
    assert(mean >= 0.15, s"IVF mean recall $mean below floor")
  }

  test("int8 IVF with exact re-rank recalls like the float IVF") {
    val exact = SimOps.knnExact(spark, sf)
      .select(col("qid"), col("nid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivfq = SimOps.knnIvfQuantized(spark, sf)
      .select(col("qid"), col("nid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, ns) =>
      ivfq.getOrElse(q, Set.empty).intersect(ns).size.toDouble / ns.size
    }
    val mean = recalls.sum / recalls.size
    // coarse-cell routing in the quantized domain loses nothing the float
    // IVF keeps (int8 error ~0.4%/element); re-rank within probed cells is
    // exact, so the floor matches the float IVF's
    assert(mean >= 0.15, s"int8 IVF mean recall $mean below floor")
  }

  test("Lloyd-refined int8 IVF recalls at least like the seed-cell IVF") {
    val exact = SimOps.knnExact(spark, sf)
      .select(col("qid"), col("nid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("qid"), col("nid")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = exact.map { case (q, ns) =>
        got.getOrElse(q, Set.empty).intersect(ns).size.toDouble / ns.size
      }
      rs.sum / rs.size
    }
    val refined = meanRecall(SimOps.knnIvfLloyd(spark, sf))
    // density-refined cells must not lose neighbors vs 10 arbitrary seed
    // vectors at the same nprobe/nlist read fraction (small slack: cell
    // boundaries move, individual queries can flip either way)
    val seeded = meanRecall(SimOps.knnIvfQuantized(spark, sf))
    assert(refined >= 0.15, s"refined IVF mean recall $refined below floor")
    assert(refined >= seeded - 0.1,
      s"refined IVF recall $refined well below seed-cell IVF $seeded")
  }

  test("RP-LSH ANN recall beats random guessing by a wide margin") {
    val exact = SimOps.knnExact(spark, sf)
      .select(col("qid"), col("nid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val lsh = SimOps.knnRpLsh(spark, sf)
      .select(col("qid"), col("nid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, ns) =>
      lsh.getOrElse(q, Set.empty).intersect(ns).size.toDouble / ns.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.15, s"RP-LSH mean recall $mean below floor")
  }

  test("int8 quantization stays in range and saturates at the scale") {
    val rows = SimOps.quantizeInt8(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mx) = (r.getAs[Long]("q_min"), r.getAs[Long]("q_max"))
      // symmetric-scale property: every element in [-127, 127], and the
      // absmax element itself quantizes to exactly ±127
      assert(mn >= -127L && mx <= 127L, s"out of int8 range: [$mn, $mx]")
      assert(mn == -127L || mx == 127L, "scale element must saturate")
      // Σ|q| bounds Σq on both sides
      assert(math.abs(r.getAs[Long]("q_sum")) <= r.getAs[Long]("q_l1"))
      assert(r.getAs[Int]("n_dims") === 64)
      assert(r.getAs[Double]("scale_absmax") > 0.0)
    }
  }

  test("quantized inner-product search recalls the float-dot top-5 well") {
    import org.apache.spark.sql.expressions.Window
    // float-precision inner-product top-5 (same metric, unquantized)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("dot"), col("nid"))
    val exact = e.select(col("vec_id").as("nid"), col("embedding").as("ne"))
      .crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("dot",
        graft.functions.NativeExprs.dot(spark, col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("nid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val quant = SimOps.knnQuantizedDot(spark, sf)
      .select(col("qid"), col("nid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (k, ns) =>
      quant.getOrElse(k, Set.empty).intersect(ns).size.toDouble / ns.size }
    val mean = recalls.sum / recalls.size
    // int8 error is ~0.4% per element; on near-orthogonal random vectors
    // some rank flips are expected, wholesale disagreement is not
    assert(mean >= 0.5, s"quantized recall $mean vs float-dot top-5")
  }

  test("seeded sample is a subset with a plausible size") {
    val li = Tables.lineitem(spark, sf)
    val total = li.count()
    val sampled = li.sample(withReplacement = false, 0.1, 42)
    val n = sampled.count()
    assert(n > total * 0.05 && n < total * 0.15,
      s"sample size $n implausible for fraction 0.1 of $total")
    // subset property: sampled keys all exist in the base table
    assert(sampled.join(li,
      Seq("l_orderkey", "l_linenumber"), "left_anti").count() === 0)
  }

  test("multimodal decode stub is deterministic and schema-stable") {
    val a = graft.operators.MultimodalOps.decodeStub(spark, sf).collect()
    val b = graft.operators.MultimodalOps.decodeStub(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "stub decode must be reproducible")
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getInt(1) >= 64 && r.getInt(1) < 64 + 640, "width bounds")
      assert(r.getInt(2) >= 64 && r.getInt(2) < 64 + 480, "height bounds")
    }
  }

  test("approx_percentile is within tolerance of exact percentile") {
    val ev = Tables.events(spark, sf)
    val exact = ev.select(percentile(col("value"), lit(0.9)))
      .head().getDouble(0)
    val approx = ev.select(
      percentile_approx(col("value"), lit(0.9), lit(1000)))
      .head().getDouble(0)
    // with accuracy=1000 the rank error is <= n/1000; translate to a loose
    // value tolerance on this distribution
    assert(math.abs(approx - exact) / math.max(exact, 1e-9) < 0.05,
      s"approx p90 $approx vs exact $exact")
  }

  test("approx_count_distinct is within 5% of exact") {
    val ev = Tables.events(spark, sf)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"), 0.01))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"HLL said $approx, exact is $exact")
  }

  test("daily HLL sketch union equals the one-shot sketch and tracks exact") {
    val ev = Tables.events(spark, sf)
    val unioned = AggOps.hllUnionDaily(spark, sf).head()
    val oneShot = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))))
      .head().getLong(0)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    // union of same-lgK sketches is a lossless register-wise max: the
    // merged estimate must equal sketching the whole table at once
    assert(unioned.getAs[Long]("est_users") === oneShot,
      "sketch union is not lossless")
    assert(math.abs(oneShot - exact).toDouble / exact <= 0.05,
      s"sketch said $oneShot, exact is $exact")
  }

  test("approx quantiles sit within rank-error bounds of the order statistic") {
    val rows = AggOps.approxQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val vals = Tables.events(spark, sf)
        .filter(col("event_type") === et)
        .select(col("value")).collect().map(_.getDouble(0)).sorted
      val n = vals.length
      Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99)).foreach { case (c, p) =>
        val got = r.getAs[Double](c)
        // percentile_approx returns an ELEMENT of the column whose rank is
        // within n/accuracy of ceil(p·n); accuracy 10000 ≫ n here, so allow
        // a ±2-rank cushion for boundary ties
        val lo = vals(math.max(0, math.ceil(p * n).toInt - 3))
        val hi = vals(math.min(n - 1, math.ceil(p * n).toInt + 1))
        assert(got >= lo && got <= hi,
          s"$et.$c=$got outside rank window [$lo, $hi]")
      }
    }
  }

  test("partial aggregation law: union of per-partition sums equals global") {
    val l = Tables.lineitem(spark, sf)
    val global = l.agg(sum(col("l_quantity"))).head().getDouble(0)
    val partial = l.repartition(8, col("l_orderkey"))
      .groupBy(spark_partition_id().as("p"))
      .agg(sum(col("l_quantity")).as("s"))
      .agg(sum(col("s"))).head().getDouble(0)
    assert(math.abs(global - partial) / math.abs(global) < 1e-9)
  }

  test("temperature mixing derives rates ∝ 1/√count and keeps the rarest stratum whole") {
    val counts = Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nmin = counts.values.min
    val got = graft.operators.FilterOps.mixTemperature(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Long]("n_kept"))).toMap
    got.foreach { case (lang, (rate, kept)) =>
      // independent driver-side replay of the rate derivation
      assert(rate === math.floor(1000.0 * math.sqrt(
        nmin.toDouble / counts(lang))).toLong, s"rate mismatch for $lang")
      assert(kept <= counts(lang))
    }
    // rate 1000 means hash mod 1000 < 1000: the rarest language keeps ALL
    val rarest = counts.minBy(c => (c._2, c._1))._1
    assert(got(rarest)._1 === 1000L)
    assert(got(rarest)._2 === counts(rarest))
  }

  test("token-budget mixing derives exact targets and damps the head rate") {
    // independent driver-side replay of the whole derivation from raw
    // token counts — the deterministic contract (statistical closeness of
    // the realized sample is a corpus-size property: ±4% at sf0.1, but
    // ±40% swings at sf0.001's ~100-doc strata, so exactness of the
    // DERIVATION is what a fixture this small can pin)
    val toks = Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("t"))
      .groupBy(col("lang")).agg(sum(col("t")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tt = toks.values.sum
    val ss = toks.values.map(t => math.sqrt(t.toDouble).toLong).sum
    val rows = graft.operators.FilterOps.mixTokenBudget(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("total_tokens"),
        r.getAs[Long]("target_tok"), r.getAs[Long]("rate"),
        r.getAs[Long]("kept_tokens"))).toMap
    rows.foreach { case (lang, (total, target, rate, kept)) =>
      assert(total === toks(lang))
      val sq = math.sqrt(toks(lang).toDouble).toLong
      // BigInt mirrors the DECIMAL(38,0)/HUGEINT exact integer division
      val expTarget = (BigInt(tt) * sq / (BigInt(4) * ss)).toLong
      assert(target === expTarget, s"$lang target")
      assert(rate === math.min(1000L, 1000L * expTarget / toks(lang)),
        s"$lang rate")
      assert(kept <= total)
    }
    // α = ½ damps the head DETERMINISTICALLY at the rate level: the
    // largest stratum must get the smallest keep-rate
    val head = rows.maxBy(_._2._1)._1
    assert(rows(head)._3 === rows.values.map(_._3).min,
      "head stratum does not carry the minimum keep-rate")
  }

  test("unigram cross-entropy: hand-computed micro-nat units on a " +
      "three-token LM") {
    import TestSpark.spark.implicits._
    // corpus tokens: a×3, b×1, c×1 (total 5)
    // d0 = "a a b": nll = 2·⌊ln(5/3)·1e6⌋ + ⌊ln(5)·1e6⌋ = 2·510825
    //      + 1609437 = 2631087 over 3 tokens
    // d1 = "a c":   nll = 510825 + 1609437 = 2120262 over 2 tokens
    // per-token: d1 (1.060131) > d0 (0.877029)
    val docs = Seq((0L, "a a b"), (1L, "a c")).toDF("doc_id", "text")
    val out = graft.operators.TextOps.unigramXentOn(docs)
      .orderBy(desc("xent_nats"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 2120262L), (0L, 3L, 2631087L)))
  }

  test("BPE merges replay the classic hug/pug/pun hand example, " +
      "deterministically") {
    import TestSpark.spark.implicits._
    // word frequencies hug×10 pug×5 pun×12 bun×4 hugs×5 — the canonical
    // walkthrough: (u,g)=20 → 'ug'; then (u,n)=16 → 'un'; then
    // (h,ug)=15 → 'hug'
    val words = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug")
      ++ Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
    val docs = Seq(Tuple1(words.mkString(" "))).toDF("body")
    val got = graft.api.Graft.bpeMerges(docs, "body", k = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((1, "u", "g", 20L), (2, "u", "n", 16L),
      (3, "h", "ug", 15L)))
    // bit-deterministic across runs (driver argmax + integral counts)
    val again = graft.api.Graft.bpeMerges(docs, "body", k = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(again.toSeq === got.toSeq)
  }

  test("BPE prefix consistency: merges at k=3 are the first 3 merges of " +
      "a k=16 learn, snapshots match standalone learns, exhaustion is a " +
      "fixpoint") {
    import TestSpark.spark.implicits._
    val spark = TestSpark.spark
    val words = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug")
      ++ Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
      .toDF("word")
    def mseq(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    def vset(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Seq[String]]("s"), r.getAs[Long]("cnt"))).toSet
    val (m16, snaps) = graft.operators.TextOps
      .bpeLearnSnapshots(spark, words, Seq(3, 16))
    val (m3, v3) = graft.operators.TextOps.bpeLearnOn(spark, words, 3)
    // the k-sweep contract: one long learn serves every prefix
    assert(mseq(m3) === mseq(m16).take(3))
    assert(vset(snaps.head._2) === vset(v3))
    // 5 distinct words exhaust their pairs well before 16 merges: the
    // 16-snapshot is the learn's fixpoint, with every word one token
    val applied = mseq(m16).size
    assert(applied < 16)
    assert(snaps.last._1 === 16)
    val fix = vset(snaps.last._2)
    assert(fix.forall(_._1.size == 1))
    // and the registered-report aggregates read off those states:
    // token count after 3 merges = sum(cnt * |s|) of the 3-snapshot
    val tok3 = snaps.head._2
      .agg(sum(col("cnt") * size(col("s")))).head().getLong(0)
    // hug/pug/pun/bun/hugs after ug, un, hug: hug=1tok x10, pug=2 x5,
    // pun=2 x12, bun=2 x4, hugs=2 x5 -> 10+10+24+8+10 = 62
    assert(tok3 === 62L)
  }

  test("batched BPE learn is bit-identical to the one-merge-per-round " +
      "loop: merges, counts, and every snapshot, on randomized corpora") {
    import TestSpark.spark.implicits._
    val spark = TestSpark.spark
    def mseq(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    def vset(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Seq[String]]("s"), r.getAs[Long]("cnt"))).toSet
    // adversarial shapes: skewed zipf-ish repeats force ties and dense
    // symbol interactions (the createdSafe stop), repeated letters force
    // self-pairs like (a,a), a tiny alphabet maximizes batch conflicts
    val rnd = new scala.util.Random(13)
    (0 until 3).foreach { trial =>
      val alphabet = "abcde".take(3 + trial)
      val vocabWords = Vector.fill(60) {
        (0 until (2 + rnd.nextInt(7)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val words = vocabWords.flatMap(w =>
        Seq.fill(1 + rnd.nextInt(20))(w)).toDF("word")
      val ks = Seq(5, 24)
      val (mBatched, sBatched) =
        graft.operators.TextOps.bpeLearnSnapshots(spark, words, ks)
      val (mClassic, sClassic) =
        graft.operators.TextOps.bpeLearnSnapshots(spark, words, ks,
          batchCap = 1)
      assert(mseq(mBatched) === mseq(mClassic), s"merge list, trial $trial")
      sBatched.zip(sClassic).foreach { case ((kb, vb), (kc, vc)) =>
        assert(kb === kc)
        assert(vset(vb) === vset(vc), s"snapshot k=$kb, trial $trial")
      }
    }
  }

  test("BPE merges are partition-invariant: a reshuffled corpus learns " +
      "the identical merge list") {
    import TestSpark.spark.implicits._
    val words = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug")
      ++ Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
      .toDF("word")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextOps.bpeMergesOn(TestSpark.spark, df, k = 3)
        .collect().map(r =>
          (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // integral counts + driver argmax with total tie-order ⇒ the layout
    // of the input across partitions must not be observable
    assert(run(words.repartition(7)) === run(words.coalesce(1)))
  }

  test("bpeTokenize encodes with the learned merges in rank order") {
    import TestSpark.spark.implicits._
    // merges [u+g, u+n, h+ug]: 'hugs' → h,u,g,s → h,ug,s → hug,s;
    // 'pun' → p,un; 'bug' → b,ug — and train/encode round-trip composes
    val docs = Seq((1L, "hugs pun bug")).toDF("id", "body")
    val out = graft.api.Graft.bpeTokenize(docs, "body",
      Seq(("u", "g"), ("u", "n"), ("h", "ug"))).collect().head
    assert(out.getAs[Seq[String]]("bpe_tokens")
      === Seq("hug", "s", "p", "un", "b", "ug"))
    assert(out.getAs[Int]("n_bpe_tokens") === 6)
  }

  test("BPE ignores empty words from repeated/trailing spaces: no " +
      "phantom ('','') pair in training, no phantom tokens in encode") {
    import TestSpark.spark.implicits._
    // a plain-space split of this body yields empty words at the double
    // space and the trailing space; unguarded they decompose via the
    // DESCENDING sequence(1, 0) to ["", ""] — stealing a merge rank in
    // training and inflating n_bpe_tokens by 2 per empty word in encode
    val docs = Seq((1L, "ab  ab ab ")).toDF("id", "body")
    val merges = graft.api.Graft.bpeMerges(docs, "body", k = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq(("a", "b", 3L)),
      s"expected the single real pair; got ${merges.toSeq}")
    val enc = graft.api.Graft.bpeTokenize(docs, "body", Seq(("a", "b")))
      .collect().head
    assert(enc.getAs[Seq[String]]("bpe_tokens") === Seq("ab", "ab", "ab"))
    assert(enc.getAs[Int]("n_bpe_tokens") === 3)
  }

  test("BPE survives adversarial tokens: backslashes, quotes, doubled " +
      "quotes and newlines round-trip the SQL-literal interpolation") {
    import TestSpark.spark.implicits._
    val spark = TestSpark.spark
    // every one of these words, raw in a corpus, reaches expr() inside
    // the merge fold as a string literal (r17 advice: '\' used to pass
    // through unescaped and could swallow the closing quote / mis-parse)
    val nasty = Seq("\\a", "'b", "c''d", "e\nf", "\\'g", "\\\\h")
    val words = nasty.flatMap(w => Seq.fill(3)(w)).toDF("word")
    val (merges, snaps) = graft.operators.TextOps
      .bpeLearnSnapshots(spark, words, Seq(16))
    val mseq = merges.collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // every pair of every word merges (each word is its own closed
    // pair universe; counts are per-word multiplicity x3)
    assert(mseq.forall(_._3 % 3 == 0), s"counts must be x3: $mseq")
    val fix = snaps.head._2.collect()
      .map(r => r.getAs[scala.collection.Seq[String]]("s").toVector)
    assert(fix.map(_.mkString).toSet === nasty.toSet,
      "vocab fixpoint must reproduce every original word exactly")
    assert(fix.forall(_.size == 1),
      "each nasty word must fully merge back into one token")
    // encode side: the same literals ride bpeApplyOn's fold
    val docs = Seq((1L, nasty.mkString(" "))).toDF("id", "body")
    val enc = graft.operators.TextOps.bpeApplyOn(docs, "body",
        mseq.map(m => (m._1, m._2))).collect().head
    assert(enc.getAs[scala.collection.Seq[String]]("bpe_tokens").toSet
      === nasty.toSet)
  }

  test("pipeline_vector_ingest: verdicts partition the incoming batch, " +
      "and the quarantine arm equals the OOD monitor's flag count") {
    import graft.operators.{PipelineOps, SimOps}
    val got = PipelineOps.vectorIngest(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nOdd = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 2 === 1).count()
    assert(got.values.sum === nOdd,
      s"every incoming vector gets exactly one verdict: $got vs $nOdd")
    assert(got.keySet.subsetOf(
      Set("admitted", "ood_quarantine", "semantic_dup")))
    assert(got.getOrElse("admitted", 0L) > 0, "fixture admits some rows")
    // the funnel's quarantine arm IS the monitor's per-cell flag total
    // (same gate, per-item vs per-cell projection)
    val flagged = SimOps.oodReport(spark, sf).collect()
      .map(_.getAs[Long]("n_flagged")).sum
    assert(got.getOrElse("ood_quarantine", 0L) === flagged,
      "funnel quarantine must equal the monitor's flag count")
  }

  test("vector snapshot advance: the funnel balances and the gate uses " +
      "post-expiry radii") {
    import graft.operators.{PipelineOps, SimOps}
    val got = PipelineOps.vectorAdvance(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // index balance: 6_index = 1_base - 2_expired + 4_admitted, and
    // every incoming vector gets exactly one verdict
    assert(got("6_index") ===
      got("1_base") - got("2_expired") + got("4_admitted"))
    assert(got("4_admitted") + got("5_quarantined") === got("3_incoming"))
    assert(got("2_expired") > 0 && got("4_admitted") > 0
      && got("5_quarantined") > 0, s"all funnel arms live: $got")
    // ordering contract: the gate's radii come from the SURVIVING
    // population — gating against the full (pre-expiry) base flags a
    // DIFFERENT set on this fixture, which is exactly the bug the
    // composition prevents
    val e = Tables.embeddings(spark, sf).select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val (cells, cents) = SimOps.lloydCellsOn(spark,
      e.filter(col("vec_id") % 2 === 0), nlist = 20)
    val preExpiry = SimOps.oodFlagsOn(spark, cells, cents,
        e.filter(col("vec_id") % 2 =!= 0))
      .filter(col("flagged")).count()
    assert(preExpiry !== got("5_quarantined"),
      "pre-expiry radii must flag a different set than the composition")
  }

  test("open-vocab generator: deterministic, syllable-shaped, genuinely " +
      "open, and the learn does NOT exhaust at k = 64") {
    import graft.operators.TextOps
    val spark = TestSpark.spark
    val w1 = TextOps.openVocabWords(spark, 300).collect()
      .map(_.getString(0))
    val w2 = TextOps.openVocabWords(spark, 300).collect()
      .map(_.getString(0))
    assert(w1.sorted.toSeq === w2.sorted.toSeq, "pure function of n")
    assert(w1.forall(_.matches("([bdfgklmn][aeiou]){3,6}")),
      "every word is 3..6 CV syllables from the fixed inventory")
    assert(w1.distinct.length > 200,
      s"open vocabulary, not a closed handful: ${w1.distinct.length}")
    // the whole point vs the documents fixture (exhausts at 89): a
    // 64-merge learn applies all 64 merges even on a 300-id slice
    val (merges, _) = TextOps.bpeLearnSnapshots(spark,
      TextOps.openVocabWords(spark, 300), Seq(64))
    assert(merges.count() === 64L, "no pair exhaustion on the open corpus")
  }

  test("batched BPE learn stays bit-identical to the classic loop on " +
      "the open-vocab corpus") {
    import graft.operators.TextOps
    val spark = TestSpark.spark
    def mseq(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    def vset(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[scala.collection.Seq[String]]("s").toVector,
        r.getAs[Long]("cnt"))).toSet
    val words = TextOps.openVocabWords(spark, 150)
    val ks = Seq(6, 24)
    val (mB, sB) = TextOps.bpeLearnSnapshots(spark, words, ks)
    val (mC, sC) = TextOps.bpeLearnSnapshots(spark, words, ks, batchCap = 1)
    assert(mseq(mB) === mseq(mC))
    sB.zip(sC).foreach { case ((kb, vb), (kc, vc)) =>
      assert(kb === kc)
      assert(vset(vb) === vset(vc), s"snapshot k=$kb")
    }
  }

  test("bpeApplyStats vocab-join tokenization equals the row-local fold") {
    import graft.operators.TextOps
    // the registered query tokenizes via vocab-join; bpeApplyOn folds
    // per row. Same learned merges → identical per-lang token totals.
    val docs = Tables.documents(spark, sf)
    val words = docs.selectExpr("explode(split(text, ' ')) AS word")
    val (mergesDf, _) = TextOps.bpeLearnOn(spark, words, k = 8)
    val merges = mergesDf.collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val rowLocal = TextOps.bpeApplyOn(docs, "text", merges)
      .groupBy(col("lang"))
      .agg(sum(col("n_bpe_tokens").cast("long")).as("n_bpe_tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stats = TextOps.bpeApplyStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(stats.map(s => s._1 -> s._5).toMap === rowLocal)
    stats.foreach { case (lang, nDocs, nWords, nChars, nBpe, comp) =>
      assert(nDocs > 0 && nWords >= nDocs)
      // BPE starts from characters: tokens per word in [1, wordLen]
      assert(nBpe >= nWords && nBpe <= nChars,
        s"$lang: $nBpe tokens outside [$nWords, $nChars]")
      assert(comp === nBpe * 1000 / nChars)
      assert(comp <= 1000)
    }
  }

  test("ivfNprobeReport: recall monotone in nprobe; nprobe=2 row equals " +
      "the scaled-query overlap") {
    val rows = SimOps.ivfNprobeReport(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(1, 2, 4))
    // more probed cells can only widen the candidate set → recall is
    // monotone non-decreasing in nprobe
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 >= lo._2, s"recall dropped with more probes: $lo -> $hi")
    }
    // independent replay: sim_knn_ivf_scaled IS (√n nlist, nprobe=2, k=5)
    val exact = SimOps.knnExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val want2 = SimOps.knnIvfScaled(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).count(exact.contains).toLong
    assert(rows.find(_._1 == 2).get._2 === want2)
    rows.foreach { case (_, hits, nEx, rec) =>
      assert(hits <= nEx && rec >= 0 && rec <= 1000)
      assert(nEx === exact.size.toLong)
    }
  }

  test("Graft.ivfRecallSweep: explicit nlists reproduce the registered " +
      "nlist report's knn columns; default sweep brackets sqrt(n)") {
    val emb = Tables.embeddings(spark, sf)
    val swept = graft.api.Graft.ivfRecallSweep(emb, "vec_id", "embedding",
        col("vec_id") < 10, nlists = Seq(10, 20, 40))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val report = SimOps.ivfNlistReport(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(swept.toSeq === report.toSeq)
    // default sweep: {⌈√500⌉/2, ⌈√500⌉, 2⌈√500⌉} = {11, 23, 46}
    val dflt = graft.api.Graft.ivfRecallSweep(emb, "vec_id", "embedding",
      col("vec_id") < 10).collect().map(_.getInt(0))
    assert(dflt.toSeq === Seq(11, 23, 46))
  }

  test("bpeHoldout: unseen words get the learned merges applied, seen " +
      "words tokenize exactly as in the train vocab") {
    import spark.implicits._
    import graft.operators.TextOps
    // train (even ids) words: hug×4, pun, bun. Merge derivation by hand:
    // r1 pairs (h,u):4 (u,g):4 (u,n):2 (p,u):1 (b,u):1 → tie → lex →
    // (h,u); r2 (hu,g):4; r3 (u,n):2; r4 tie@1 → (b,un); r5 (p,un);
    // r6 no pairs → learning stops at 5 merges (k=8 requested — the
    // empty-argmax early stop, mirrored by empty mg CTEs in the oracle)
    val docs = Seq(
      (0L, "en", "hug hug hug pun"),
      (2L, "en", "hug bun"),
      (1L, "en", "hug hugs gug"),
      (3L, "en", "pun zz")).toDF("doc_id", "lang", "text")
    val got = TextOps.bpeHoldoutOn(spark, docs).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(1) === 2L) // n_docs
    assert(r.getLong(2) === 5L) // words: hug hugs gug pun zz
    // unseen: hugs, gug, zz (hug and pun are in the train vocab)
    assert(r.getLong(3) === 3L)
    assert(r.getLong(4) === 15L) // chars: 3+4+3+3+2
    // transfer-apply: hug→[hug]=1, hugs→[hug,s]=2 (UNSEEN word
    // compressed by the learned merges — not char fallback), gug→3
    // ((u,g) was never learned; (h,u) won its tie), pun→[pun]=1, zz→2
    assert(r.getLong(5) === 9L)
  }

  test("ivfRecallSweep completeness invariant: nprobe >= nlist probes " +
      "every cell, so recall is exactly 1000 permille") {
    val emb = Tables.embeddings(spark, sf)
    val rows = graft.api.Graft.ivfRecallSweep(emb, "vec_id", "embedding",
        col("vec_id") < 10, nlists = Seq(5, 10), nprobe = 10, k = 5)
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"nlist=${r.getInt(0)}: ${r.getLong(1)} of ${r.getLong(2)} hits")
      assert(r.getLong(3) === 1000L)
    }
  }

  test("thresholdReportOn equals a driver union-find replay on a seeded " +
      "random scored pair set") {
    import spark.implicits._
    import graft.operators.DedupOps
    val rng = new scala.util.Random(13)
    val pairs = Seq.fill(120)((rng.nextInt(40).toLong,
        rng.nextInt(40).toLong, rng.nextDouble()))
      .filter(p => p._1 != p._2)
    val toks = (0L until 40L).map(i => (i, i % 7 + 1))
    val got = DedupOps.thresholdReportOn(
        pairs.toDF("a", "b", "jaccard"),
        toks.toDF("doc_id", "n_tok"), Seq(250, 500, 750))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val tokMap = toks.toMap
    Seq(250, 500, 750).foreach { tau =>
      val p = pairs.filter(_._3 >= tau / 1000.0)
      val nodes = p.flatMap(e => Seq(e._1, e._2)).distinct
      val parent = scala.collection.mutable.Map(
        nodes.map(n => n -> n): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      p.foreach { case (a, b, _) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val byRoot = nodes.groupBy(find)
      val dropped = byRoot.values.flatMap(m => m.filter(_ != m.min)).toSeq
      val want = (p.size.toLong, nodes.size.toLong, byRoot.size.toLong,
        dropped.size.toLong, dropped.map(tokMap).sum)
      assert(got(tau) === want, s"tau=$tau")
    }
  }

  test("qualityFunnel: first-fail attribution on a hand corpus, one doc " +
      "per rule, overlap billed to the earlier rule") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "en", "a b c"), // 3 tokens → rule 1
      // 20 tokens, 4 distinct (ALSO dominance-failing → must bill rule 2)
      (2L, "en", (Seq.fill(17)("x") ++ Seq("y", "z", "w")).mkString(" ")),
      // 20 tokens, 16 distinct, 'm'×5 → share 25% → rule 3
      (3L, "en", (Seq.fill(5)("m") ++
        "a b c d e f g h i j k l n o p".split(" ")).mkString(" ")),
      // two disjoint-vocab normal docs → every bigram unique → xent 0
      (4L, "en", (1 to 20).map(i => s"d$i").mkString(" ")),
      (5L, "en", (1 to 20).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val got = TextOps.qualityFunnelOn(spark, docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1, "too_short", 1L, 4L),
      (2, "low_diversity", 1L, 3L),
      (3, "token_dominance", 1L, 2L),
      (4, "low_fluency", 0L, 2L)))
    // fixture invariants: remaining monotone, total conserved
    val fix = TextOps.qualityFunnel(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    fix.map(_._2).sliding(2).foreach { case Array(a, b) => assert(b <= a) }
  }

  test("docPerplexity: hand-computed micro-nat units on a two-doc corpus") {
    import spark.implicits._
    import graft.operators.TextOps
    // bigrams: A → (x,y),(y,x),(x,y); B → (x,z)
    // c(x,·)=3, c(y,·)=1; qln(x,y)=floor(ln(3/2)e6)=405465, qln(y,x)=0,
    // qln(x,z)=floor(ln 3 · e6)=1098612
    val docs = Seq((1L, "en", "x y x y"), (2L, "en", "x z"),
      (3L, "en", "solo")) // < 2 tokens → drops
      .toDF("doc_id", "lang", "text")
    val got = TextOps.docPerplexityOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === ((3L, 810930L, 810930.0 / 3 / 1e6)))
    assert(got(2L) === ((1L, 1098612L, 1098612.0 / 1 / 1e6)))
    // public API shape
    val pub = graft.api.Graft.bigramPerplexity(
      docs.toDF("id", "l", "body"), "id", "body").collect()
    assert(pub.map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("dedup threshold report: hand-computed sweep + fixture monotonicity") {
    import spark.implicits._
    import graft.operators.DedupOps
    val pairs = Seq((1L, 2L, 0.95), (2L, 3L, 0.5), (4L, 5L, 0.31))
      .toDF("a", "b", "jaccard")
    val toks = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L))
      .toDF("doc_id", "n_tok")
    val got = DedupOps.thresholdReportOn(pairs, toks, Seq(300, 600, 900))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // τ=300: {1,2,3} + {4,5} → dropped 2,3,5 (tokens 100)
    assert(got(300) === ((3L, 5L, 2L, 3L, 100L)))
    // τ=600 and τ=900: only (1,2) survives → drop doc 2 (20 tokens)
    assert(got(600) === ((1L, 2L, 1L, 1L, 20L)))
    assert(got(900) === ((1L, 2L, 1L, 1L, 20L)))
    // fixture: every count is monotone non-increasing in τ
    val fix = DedupOps.thresholdReport(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(5)))
      .sortBy(_._1)
    fix.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._3 <= lo._3 && hi._4 <= lo._4,
        s"non-monotone sweep: $lo -> $hi")
    }
  }

  test("zipf slope: hand-quantized OLS on a skewed group, exact 0 on uniform") {
    import TestSpark.spark.implicits._
    // group g: a×4, b×2, c×1 → ranked points (ln1,ln4),(ln2,ln2),(ln3,0);
    // group u: three equal-frequency terms → flat line, slope EXACTLY 0
    val docs = Seq(("g", "a a a a b b c"), ("u", "x y z x y z"))
      .toDF("src", "text")
    def q(v: Double): Long = math.floor(math.log(v) * 1e6).toLong
    val xs = Seq(q(1), q(2), q(3)); val ys = Seq(q(4), q(2), q(1))
    val n = 3L
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val want = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val got = graft.api.Graft.zipfSlope(docs, "src", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("g") === ((3L, want)))
    assert(want < 0.0) // heavier head than tail ⇒ falling rank–freq line
    assert(got("u") === ((3L, 0.0)))
  }

  test("top-k is a prefix of the total order") {
    val sorted = AggOps.wordcount(spark, sf).collect().map(_.getString(0))
    val full = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("word"))
      .collect().map(_.getString(0))
    assert(sorted.toSeq === full.take(sorted.length).toSeq)
  }

  test("leakage-safe split: zero cross-split pairs on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1L to 400L).map(Tuple1(_)).toDF("doc_id")
    val pairs = (1 to 250).map { _ =>
      val a = rnd.nextInt(400) + 1L; val b = rnd.nextInt(400) + 1L
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).toDF("a", "b")
    val splits = graft.api.Graft.leakageSafeSplit(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val crossing = pairs.collect().count(r =>
      splits(r.getLong(0)) != splits(r.getLong(1)))
    assert(crossing === 0, s"$crossing random pairs crossed splits")
    assert(splits.values.toSet.size >= 2, "400 docs must span >= 2 splits")
  }

  test("leakage-safe split: clusters move whole, no cross-split pair") {
    import spark.implicits._
    val docs = (1L to 40L).map(Tuple1(_)).toDF("doc_id")
    // two chains {1,2,3} and {10,11}, plus a long path {20..25}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L)).toDF("a", "b")
    val out = graft.api.Graft.leakageSafeSplit(docs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length === 40)
    val byId = out.map(t => t._1 -> t).toMap
    // every member of a cluster shares the root's split
    for (grp <- Seq(Seq(1L, 2L, 3L), Seq(10L, 11L), (20L to 25L).toSeq)) {
      assert(grp.map(byId(_)._3).distinct.size === 1,
        s"cluster $grp must land in one split")
      assert(grp.map(byId(_)._2).distinct === Seq(grp.min))
    }
    // no pair crosses splits — the defining property
    val splits = out.map(t => t._1 -> t._3).toMap
    val crossing = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 25L))
      .count { case (a, b) => splits(a) != splits(b) }
    assert(crossing === 0)
    // singletons use their own id as root
    assert(byId(40L)._2 === 40L)
    // deterministic across invocations
    val again = graft.api.Graft.leakageSafeSplit(docs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(again === out.map(t => (t._1, t._3)).toSet)
  }

  test("span corruption: blocks collapse to one sentinel, targets " +
      "reconstruct") {
    import spark.implicits._
    val docs = Seq((4L, "en",
      "a b c d e f g h i j k")).toDF("doc_id", "lang", "text") // 11 toks
    val out = graft.api.Graft.spanCorrupt(docs, ratePerMille = 400)
      .collect().head
    // driver replay of the (doc, block) decision
    val P = 2147483647L
    def masked(d: Long, b: Long): Boolean =
      ((d * 524287 + b) % P) * 1103515245L % P % 1000 < 400
    val words = "a b c d e f g h i j k".split(" ")
    val blocks = words.indices.map(ix => ix / 3)
    val corrupted = words.indices.flatMap { ix =>
      if (!masked(4L, blocks(ix))) Some(words(ix))
      else if (ix % 3 == 0) Some("<x>") else None
    }.mkString(" ")
    val targets = words.indices
      .filter(ix => masked(4L, blocks(ix))).map(words).mkString(" ")
    val nSpans = (0L to (words.length - 1) / 3)
      .count(masked(4L, _)).toLong
    assert(out.getLong(2) === 11L)
    assert(out.getLong(3) === nSpans)
    assert(out.getString(5) === corrupted)
    assert(out.getString(6) === targets)
    assert(nSpans > 0, "fixture must actually mask at this rate")
    // corrupted + targets account for every original token:
    // each masked block contributes 3 (or a tail remainder) to targets
    assert(out.getLong(4) === targets.split(" ").length.toLong)
    // rate 0 is the identity
    val id0 = graft.api.Graft.spanCorrupt(docs, 0).collect().head
    assert(id0.getString(5) === "a b c d e f g h i j k")
    assert(id0.getLong(3) === 0L && id0.getLong(4) === 0L)
  }

  test("mlm mask: deterministic, replayable, and rate-faithful") {
    import spark.implicits._
    val docs = Seq(
      (7L, "en", "alpha beta gamma delta epsilon zeta eta theta"),
      (8L, "de", "one two three")
    ).toDF("doc_id", "lang", "text")
    val out = graft.api.Graft.mlmMask(docs, ratePerMille = 300)
      .collect()
    // driver replay of the hash decision per (doc, 1-based position)
    val P = 2147483647L
    def masked(d: Long, i: Long): Boolean =
      ((d * 131071 + i) % P) * 1103515245L % P % 1000 < 300
    for (r <- out) {
      val d = r.getLong(0)
      val words = docs.filter(col("doc_id") === d)
        .collect().head.getString(2).split(" ")
      val expect = words.zipWithIndex.map { case (w, ix) =>
        if (masked(d, ix + 1L)) "<m>" else w }
      assert(r.getLong(2) === words.length.toLong)
      assert(r.getLong(3) === expect.count(_ == "<m>").toLong)
      assert(r.getString(4) === expect.mkString(" "))
    }
    // same input twice → identical corruption
    val again = graft.api.Graft.mlmMask(docs, ratePerMille = 300).collect()
    assert(out.map(_.getString(4)).toSeq === again.map(_.getString(4)).toSeq)
    // rate 0 masks nothing; rate 1000 masks everything
    val none = graft.api.Graft.mlmMask(docs, 0).collect()
    assert(none.forall(_.getLong(3) == 0L))
    val all = graft.api.Graft.mlmMask(docs, 1000).collect()
    assert(all.forall(r => r.getLong(3) === r.getLong(2)))
  }
}
