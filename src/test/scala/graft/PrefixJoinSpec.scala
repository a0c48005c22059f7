package graft

import graft.functions.NativeExprs
import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactness and sub-quadratic-candidate properties of the prefix-filtered
  * (AllPairs/PPJoin) exact-Jaccard join (DedupOps.prefixCandidates /
  * blockedJaccardPairs). Both corpora here are ADVERSARIAL single-block
  * inputs — the shape where the pre-r6 within-block all-pairs join was
  * O(n²) — so the reference answer is computed by an independent in-test
  * all-pairs join and compared pair-for-pair.
  */
class PrefixJoinSpec extends AnyFunSuite {
  import TestSpark._

  /** Independent reference: brute-force all-pairs jaccard over the same
    * blockShingles frame (the pre-r6 shape, correct by construction at
    * test scale).
    */
  private def bruteForcePairs(corpus: DataFrame,
      tau: Double = 0.3): Set[(Long, Long)] = {
    val sh = DedupOps.blockShingles(corpus)
    val a = sh.select(col("doc_id").as("a"), col("lang"), col("source"),
      col("sh").as("sha"))
    val b = sh.select(col("doc_id").as("b"), col("lang"), col("source"),
      col("sh").as("shb"))
    a.join(b, Seq("lang", "source"))
      .filter(col("a") < col("b"))
      .withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("sha"), col("shb")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** One (lang, source) block: 200 docs sharing a 10-token header (common
    * shingles the frequency ordering must exile from prefixes) + 20 unique
    * tokens each; every 10th doc gets a planted truncated copy (id+1000).
    */
  private def headerCorpus: DataFrame = {
    import TestSpark.spark.implicits._
    val header = (0 until 10).map(i => s"c$i").mkString(" ")
    val docs = (0 until 200).map { i =>
      val unique = (0 until 20).map(j => s"u${i}_$j").mkString(" ")
      (i.toLong, "en", "web", s"$header $unique")
    }
    val copies = docs.filter(_._1 % 10 == 0).map { case (id, l, s, t) =>
      (id + 1000L, l, s, t.split(" ").dropRight(5).mkString(" "))
    }
    (docs ++ copies).toDF("doc_id", "lang", "source", "text")
  }

  /** Borderline corpus: 150 docs, each a k-token mutation (k ∈ [0, 30]) of
    * one of 10 base docs — jaccards spread across the 0.3 threshold from
    * both sides, the boundary the epsilon arithmetic must not move.
    */
  private def mutationCorpus: DataFrame = {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(7)
    val bases = Vector.fill(10)(Vector.fill(40)(s"w${rnd.nextInt(400)}"))
    val docs = (0 until 150).map { i =>
      val base = bases(rnd.nextInt(10))
      val k = rnd.nextInt(31)
      val hit = rnd.shuffle(base.indices.toList).take(k).toSet
      val text = base.zipWithIndex
        .map { case (w, p) => if (hit(p)) s"m${i}_$p" else w }
        .mkString(" ")
      (i.toLong, "en", "web", text)
    }
    docs.toDF("doc_id", "lang", "source", "text")
  }

  test("prefix-filtered jaccard equals brute-force all-pairs (header corpus)") {
    val corpus = headerCorpus
    val got = pairsOf(DedupOps.blockedJaccardPairs(corpus))
    val want = bruteForcePairs(corpus)
    assert(want.nonEmpty, "fixture must plant at least one true pair")
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("prefix-filtered jaccard equals brute-force all-pairs (0.3-boundary corpus)") {
    val corpus = mutationCorpus
    val got = pairsOf(DedupOps.blockedJaccardPairs(corpus))
    val want = bruteForcePairs(corpus)
    assert(want.nonEmpty, "mutation fixture should cross the threshold")
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  /** Independent reference for CONTAINMENT: brute-force directional
    * all-pairs |A∩B|/|A| over the same shingle frame.
    */
  private def bruteForceContainment(corpus: DataFrame,
      tau: Double): Set[(Long, Long)] = {
    val sh = DedupOps.blockShingles(corpus)
    val a = sh.select(col("doc_id").as("a"), col("sh").as("sha"))
    val b = sh.select(col("doc_id").as("b"), col("sh").as("shb"))
    a.crossJoin(b)
      .filter(col("a") =!= col("b"))
      .withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("sha"), col("shb")))
      .filter(col("inter").cast("double") / size(col("sha")) >= tau)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("one-sided prefix containment equals brute force on both adversarial corpora") {
    Seq(headerCorpus, mutationCorpus).foreach { corpus =>
      val got = pairsOf(DedupOps.containmentPairsOn(corpus, 0.8))
      val want = bruteForceContainment(corpus, 0.8)
      assert(want.nonEmpty, "fixture must contain directional near-subsets")
      assert(got === want,
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("derived-base fixtures and prefix join run beyond the 100k-id pinned guard") {
    // 120k docs in ONE (lang, source) block — over the pinned fixtures'
    // 100k id ceiling (plantBaseFor derives the offset instead of raising)
    // and a block where all-pairs would be ~7×10⁹ candidate pairs
    val n = 120000L
    val docs = spark.range(n).select(
      col("id").as("doc_id"), lit("en").as("lang"), lit("web").as("source"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit("d"), col("id").cast("string"), lit(s"_t$j"))): _*)
        .as("text"))
    val base = DedupOps.plantBaseFor(docs)
    assert(base === n, "base must clear the corpus' own id range")
    val pairs = DedupOps.blockedJaccardPairs(DedupOps.withNearDupesOn(docs, base))
    val expected = (0L until n).count(_ % 7 == 0).toLong
    val planted = pairs.filter(col("b") === col("a") + 2L * base).count()
    assert(planted === expected, s"planted recall $planted of $expected")
    // per-doc vocabularies are disjoint, so ONLY planted pairs qualify
    assert(pairs.count() === expected)
  }

  test("prefix-filtered jaccard equals brute force at a high threshold (tau=0.7)") {
    // tau=0.7 prefixes are much shorter (|sh|−⌈0.7·|sh|⌉+1 ≈ 0.3·|sh|) —
    // the aggressive-filtering arithmetic path the default 0.3 never takes
    val corpus = mutationCorpus
    val got = DedupOps.blockedJaccardPairs(corpus, 0.7)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForcePairs(corpus, 0.7)
    assert(want.nonEmpty, "mutation fixture should contain tau>=0.7 pairs")
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  /** Independent reference for the INCREMENTAL join: brute-force
    * incoming×index jaccard (never incoming×incoming / index×index).
    */
  private def bruteForceIncremental(index: DataFrame, incoming: DataFrame,
      tau: Double): Set[(Long, Long)] = {
    val shI = DedupOps.blockShingles(index)
    val shN = DedupOps.blockShingles(incoming)
    shN.select(col("doc_id").as("new_id"), col("lang"), col("source"),
        col("sh").as("shn"))
      .join(shI.select(col("doc_id").as("matched_id"), col("lang"),
        col("source"), col("sh").as("shi")), Seq("lang", "source"))
      .withColumn("inter",
        NativeExprs.sortedIntersectCount(spark, col("shn"), col("shi")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("shn")) + size(col("shi")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("new_id"), col("matched_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("incremental near-dedup equals brute-force incoming×index, " +
      "including incoming docs whose shingles the index never saw") {
    import TestSpark.spark.implicits._
    // index = headerCorpus originals; incoming = its planted re-crawls
    // plus 10 genuinely-new docs (every shingle f=0 in the index — the
    // left-join coalesce path) and one near-dup of a new doc that must
    // NOT match (its only neighbor is in the same batch)
    val corpus = headerCorpus
    val index = corpus.filter(col("doc_id") < 1000)
    val fresh = (0 until 10).map { i =>
      val toksNew = (0 until 25).map(j => s"fresh${i}_$j").mkString(" ")
      (5000L + i, "en", "web", toksNew)
    }.toDF("doc_id", "lang", "source", "text")
    val incoming = corpus.filter(col("doc_id") >= 1000).union(fresh)
    val got = DedupOps.incrementalNearDupsOn(index, incoming, 0.3)
      .select(col("new_id"), col("matched_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForceIncremental(index, incoming, 0.3)
    assert(want.nonEmpty, "planted re-crawls must match their originals")
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // every match pairs an incoming id with an index id — the asymmetric
    // contract (no batch-internal or index-internal pair ever emitted)
    assert(got.forall { case (n, i) => n >= 1000 && i < 1000 })
    assert(got.forall { case (n, _) => n < 5000 },
      "genuinely-new docs must not match anything in the index")
  }

  test("dedupIncremental's index tables are persisted artifacts: a " +
      "repeat invocation re-attaches instead of rebuilding, output " +
      "identical to the build-inline overload") {
    import graft.operators.ArtifactCache
    def run() = DedupOps.dedupIncremental(TestSpark.spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val first = run() // populates the artifact store if not already warm
    val (h0, b0) = (ArtifactCache.hits.get(), ArtifactCache.builds.get())
    val second = run()
    assert(ArtifactCache.builds.get() === b0,
      "second invocation must not rebuild the index-side tables")
    assert(ArtifactCache.hits.get() === h0 + 1)
    assert(second === first)
    // the persisted-index probe is byte-identical to building in-line
    val corpus = DedupOps.withNearDupes(TestSpark.spark, TestSpark.sf)
    val inline = DedupOps.incrementalNearDupsOn(
        corpus.filter(col("doc_id") < 100000L),
        corpus.filter(col("doc_id") >= 200000L), 0.3) // PlantBase = 100000
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(inline === first)
  }

  test("LSH-band incremental probe: persisted band artifact re-attaches, " +
      "union output equals the prefix-only exact set, band leg is sound " +
      "and catches every planted exact copy alone") {
    import graft.operators.ArtifactCache
    def run() = DedupOps.dedupIncrementalLsh(TestSpark.spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val first = run() // populates the artifact store if not already warm
    val (h0, b0) = (ArtifactCache.hits.get(), ArtifactCache.builds.get())
    val second = run()
    assert(ArtifactCache.builds.get() === b0,
      "second invocation must not rebuild the band index artifact")
    assert(ArtifactCache.hits.get() === h0 + 1)
    assert(second === first)
    // completeness: band ∪ prefix candidates verify to EXACTLY the same
    // pair set as the deterministic prefix-only probe
    val corpus = DedupOps.withNearDupes(TestSpark.spark, TestSpark.sf)
    val index = corpus.filter(col("doc_id") < 100000L)
    val prefixOnly = DedupOps.incrementalNearDupsOn(index,
        corpus.filter(col("doc_id") >= 200000L), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(prefixOnly === first)
    // band-leg properties, measured with the prefix candidates removed:
    // sound (verified subset of the true >= tau set) and exhaustive on
    // EXACT copies (identical text => identical signature => every band
    // collides)
    // verbatim copies (+100000 of every 5th doc, the exact-dup fixture
    // shape); the near-dup corpus itself plants only truncated re-crawls
    val copies = index.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("lang"),
        col("source"), col("text"))
    val parts = DedupOps.lshIndexTables(index, 0.5).toMap
    val bandOnly = DedupOps.incrementalLshProbe(parts("shingles"),
        parts("freq"), parts("prefix").limit(0), parts("buckets"),
        copies, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val truth = DedupOps.incrementalNearDupsOn(index, copies, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(bandOnly.map(_._1).toSet.subsetOf(truth.keySet),
      "band hits must verify against the exact >= tau set")
    val exactCopies = truth.filter(_._2 === 1.0).keySet
    assert(exactCopies.nonEmpty, "fixture must plant verbatim copies")
    assert(exactCopies.subsetOf(bandOnly.map(_._1).toSet),
      "a verbatim copy shares all bands with its original")
  }

  private def probeTriple(parts: Map[String, DataFrame], incoming: DataFrame,
      tau: Double): Set[(Long, Long, Double)] =
    DedupOps.incrementalNearDupsProbe(parts("shingles"), parts("freq"),
        parts("prefix"), incoming, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("append o probe == rebuild o probe on the 0.3-boundary corpus, " +
      "through two generations of appends") {
    // the LSM-append exactness claim: probes through an appended index
    // (batch prefixes under the FROZEN build-time order) return the
    // same exact >= tau pair set as a from-scratch rebuild over the
    // same docs — the frequency order is only a selectivity heuristic,
    // so freezing it never changes the verified output
    val corpus = mutationCorpus
    val day0 = corpus.filter(col("doc_id") < 50)
    val batch1 = corpus.filter(col("doc_id") >= 50 && col("doc_id") < 100)
    val batch2 = corpus.filter(col("doc_id") >= 100)
    val appended1 =
      DedupOps.appendDedupIndexTables(
        DedupOps.dedupIndexTables(day0, 0.3).toMap, batch1, 0.3).toMap
    val rebuilt1 =
      DedupOps.dedupIndexTables(day0.unionByName(batch1), 0.3).toMap
    val got1 = probeTriple(appended1, batch2, 0.3)
    assert(got1 === probeTriple(rebuilt1, batch2, 0.3))
    assert(got1.map(t => (t._1, t._2)) ===
      bruteForceIncremental(day0.unionByName(batch1), batch2, 0.3))
    assert(got1.nonEmpty, "the mutation families must cross the batches")
    // second generation: append batch2 onto the ALREADY-appended index
    // (order still the day-0 freeze) and probe a shifted re-crawl batch
    val appended2 =
      DedupOps.appendDedupIndexTables(appended1, batch2, 0.3).toMap
    val recrawl = corpus.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 10000L).as("doc_id"), col("lang"),
        col("source"), col("text"))
    val got2 = probeTriple(appended2, recrawl, 0.3)
    assert(got2 === probeTriple(
      DedupOps.dedupIndexTables(corpus, 0.3).toMap, recrawl, 0.3))
    assert(got2.map(t => (t._1, t._2)) ===
      bruteForceIncremental(corpus, recrawl, 0.3))
  }

  test("expire o probe == rebuild-on-survivors o probe; expired docs can " +
      "never resurface, survivors keep exact jaccards") {
    import TestSpark.spark.implicits._
    val corpus = mutationCorpus
    val index = corpus.filter(col("doc_id") < 100)
    val batch = corpus.filter(col("doc_id") >= 100)
    val tombstones = (0L until 100L).filter(_ % 3 == 0).toDF("doc_id")
    val expired = DedupOps.expireDedupIndexTables(
      DedupOps.dedupIndexTables(index, 0.3).toMap, tombstones).toMap
    val got = probeTriple(expired, batch, 0.3)
    assert(got.forall(_._2 % 3 != 0), "no expired id may ever match")
    val survivors = index.filter(col("doc_id") % 3 =!= 0)
    assert(got === probeTriple(
      DedupOps.dedupIndexTables(survivors, 0.3).toMap, batch, 0.3))
    assert(got.map(t => (t._1, t._2)) ===
      bruteForceIncremental(survivors, batch, 0.3))
    assert(got.nonEmpty, "surviving mutation families must still match")
  }

  test("compaction re-derives exactly the from-scratch tables and leaves " +
      "probes unchanged; appended LSH buckets equal the rebuild's") {
    val corpus = headerCorpus
    val day0 = corpus.filter(col("doc_id") < 100)
    val batch1 = corpus.filter(col("doc_id") >= 100 && col("doc_id") < 1000)
    val probeBatch = corpus.filter(col("doc_id") >= 1000)
    val appended = DedupOps.appendDedupIndexTables(
      DedupOps.lshIndexTables(day0, 0.3).toMap, batch1, 0.3).toMap
    val rebuilt = DedupOps.lshIndexTables(day0.unionByName(batch1), 0.3).toMap
    // band rows are order-free: the appended bucket table IS the rebuild's
    def buckets(m: Map[String, DataFrame]) = m("buckets")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(buckets(appended) === buckets(rebuilt))
    // compaction: freq and prefix re-derived from accumulated shingles
    // match the from-scratch build row-for-row
    val compacted = DedupOps.compactDedupIndexTables(appended, 0.3).toMap
    def freqRows(m: Map[String, DataFrame]) = m("freq")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    def prefixRows(m: Map[String, DataFrame]) = m("prefix")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getLong(4))).toSet
    assert(freqRows(compacted) === freqRows(rebuilt))
    assert(prefixRows(compacted) === prefixRows(rebuilt))
    // and the probe is invariant across all three index states
    val pAppended = probeTriple(appended, probeBatch, 0.3)
    assert(pAppended.nonEmpty, "planted truncations must match originals")
    assert(pAppended === probeTriple(rebuilt, probeBatch, 0.3))
    assert(pAppended === probeTriple(compacted, probeBatch, 0.3))
  }

  test("pipeline probe equals inline build: full-corpus pairs semi-joined " +
      "to a survivor subset on both endpoints == blockedJaccardPairs(subset)") {
    // the PipelineOps near-dedup stage's reuse argument, as a property:
    // J(a,b) >= tau depends only on the two docs' shingle sets and their
    // shared block attributes, so restricting the FULL pair table to
    // pairs with both endpoints in any subset is row-for-row (including
    // the jaccard value) what the inline build over that subset returns.
    Seq(headerCorpus, mutationCorpus).foreach { corpus =>
      val survivors = corpus.filter(col("doc_id") % 3 =!= 0)
      val full = DedupOps.blockedJaccardPairs(corpus)
      val ids = survivors.select(col("doc_id"))
      val probed = full
        .join(ids.select(col("doc_id").as("a")), Seq("a"), "left_semi")
        .join(ids.select(col("doc_id").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"), col("jaccard")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val inline = DedupOps.blockedJaccardPairs(survivors)
        .select(col("a"), col("b"), col("jaccard")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(inline.nonEmpty, "subset must retain at least one true pair")
      assert(probed === inline,
        s"missing=${(inline -- probed).take(5)} extra=${(probed -- inline).take(5)}")
    }
  }

  test("snapshot advance: applied == new snapshot; advanced index probes " +
      "exactly like a fresh rebuild on (unchanged + survivors)") {
    val corpus = mutationCorpus
    val old = corpus.filter(col("doc_id") < 120)
    // new snapshot: % 9 = 0 removed, % 5 = 0 re-crawled with new text,
    // ids >= 120 added, plus planted truncations of stable docs so the
    // probe stage has true near-dup work
    val toks = split(col("text"), " ")
    val newSnap = old.filter(col("doc_id") % 9 =!= 0)
      .select(col("doc_id"), col("lang"), col("source"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(corpus.filter(col("doc_id") >= 120))
      .unionByName(old.filter(col("doc_id") % 4 === 1
          && col("doc_id") % 5 =!= 0 && col("doc_id") % 9 =!= 0)
        .select((col("doc_id") + 5000L).as("doc_id"), col("lang"),
          col("source"),
          concat_ws(" ", slice(toks, lit(1), size(toks) - 3)).as("text")))
    val adv = DedupOps.advanceSnapshotTables(
      DedupOps.dedupIndexTables(old, 0.3).toMap, old, newSnap, 0.3)
    // the applyCdc invariant: the advanced store IS the new snapshot
    def rowsOf(df: DataFrame) = df.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rowsOf(adv("applied")) === rowsOf(newSnap))
    // probe-equivalence to a fresh rebuild over (unchanged ∪ survivors)
    val unchanged = old.filter(col("doc_id") % 9 =!= 0
      && col("doc_id") % 5 =!= 0)
    val rebuilt = DedupOps.dedupIndexTables(
      unchanged.unionByName(adv("survivors")), 0.3).toMap
    val recrawl = corpus.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 10000L).as("doc_id"), col("lang"),
        col("source"), col("text"))
    val got = probeTriple(adv, recrawl, 0.3)
    assert(got === probeTriple(rebuilt, recrawl, 0.3))
    assert(got.nonEmpty, "recrawl must find matches in the advanced index")
    // the stage contracts: matches exist (planted truncations caught),
    // no survivor appears in the match ledger, and the tombstones are
    // exactly the removed ∪ changed ids
    val matchedIds = adv("matches").select(col("new_id")).collect()
      .map(_.getLong(0)).toSet
    assert(matchedIds.nonEmpty, "planted truncations must be rejected")
    val survivorIds = adv("survivors").select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(matchedIds.intersect(survivorIds).isEmpty)
    val tombIds = adv("tombstones").collect().map(_.getLong(0)).toSet
    val wantTombs = (0L until 120L)
      .filter(i => i % 9 == 0 || i % 5 == 0).toSet
    assert(tombIds === wantTombs)
  }

  test("decision fixture arms straddle the keep-to-compact threshold") {
    val rows = DedupOps.dedupIndexDecision(TestSpark.spark, TestSpark.sf)
      .collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("drift30", "drift90"))
    val byArm = rows.map(r => r.getString(0) -> r).toMap
    // one fixture on EACH side of DecisionExcessTau (r18 verdict #6)
    assert(byArm("drift90").getAs[String]("decision") === "compact")
    assert(byArm("drift30").getAs[String]("decision") === "keep")
    // shared physics: both arms accumulate identical index CONTENTS, so
    // the compacted twin's candidates and the verified pairs agree —
    // only the frozen-order candidate EXCESS separates the rows
    assert(byArm("drift30").getAs[Long]("n_candidates_compacted") ===
      byArm("drift90").getAs[Long]("n_candidates_compacted"))
    assert(byArm("drift30").getAs[Long]("n_verified") ===
      byArm("drift90").getAs[Long]("n_verified"))
    assert(byArm("drift90").getAs[Long]("excess_permille") >
      byArm("drift30").getAs[Long]("excess_permille"))
    // candidates are always a superset of the verified pairs, per arm
    rows.foreach { r =>
      assert(r.getAs[Long]("n_candidates_appended") >=
        r.getAs[Long]("n_verified"))
      assert(r.getAs[Long]("n_candidates_compacted") >=
        r.getAs[Long]("n_verified"))
    }
  }

  test("candidate count is far below n(n-1)/2 on a single hot block") {
    val corpus = headerCorpus
    val n = corpus.count()
    val cand = DedupOps.prefixCandidates(
      DedupOps.blockShingles(corpus), 0.3).count()
    val allPairs = n * (n - 1) / 2
    // frequency-ordered prefixes exile the shared header: candidates are
    // the planted pairs plus rare-hash coincidences, orders of magnitude
    // below the quadratic count the pre-r6 join enumerated
    assert(cand <= allPairs / 20,
      s"prefix filter degenerated: $cand candidates of $allPairs pairs")
    assert(cand >= 20, s"planted pairs must be candidates, got $cand")
  }
}
