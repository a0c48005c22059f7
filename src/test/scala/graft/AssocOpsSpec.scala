package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AggOps, FilterOps, SimOps, TextOps}

/** Invariant checks for the round-9 additions (each is also oracle
  * hash-checked end to end; these pin the properties a hash can't name).
  */
class AssocOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("copurchase lift: pairs ordered, support floor holds, lift consistent") {
    val rows = AggOps.copurchaseLift(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (nAb, nA, nB) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b, "pair not canonically ordered")
      assert(nAb >= 2, "support floor violated")
      // co-occurrence can never exceed either marginal support
      assert(nAb <= nA && nAb <= nB)
      // lift > 1 for everything the top-20 surfaces on this fixture:
      // a pair that co-occurs at independence rate can't out-rank the
      // positively-associated ones
      assert(r.getDouble(5) > 1.0)
    }
    // descending by lift with deterministic (a, b) tie-break
    val lifts = rows.map(_.getDouble(5)).toSeq
    assert(lifts == lifts.sorted(Ordering[Double].reverse))
  }

  test("bm25: rank 1..3 per doc, scores positive and non-increasing") {
    val rows = TextOps.bm25Top(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, perDoc) =>
      val byRank = perDoc.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to byRank.length))
      val scores = byRank.map(_.getDouble(3)).toSeq
      assert(scores.forall(_ > 0.0))
      assert(scores == scores.sorted(Ordering[Double].reverse))
    }
  }

  test("hybrid RRF: 10 ranked fusions per query, scores bounded by 2/61") {
    val rows = SimOps.hybridRrf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, perQ) =>
      val byRank = perQ.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to byRank.length))
      assert(byRank.length == 10)
      val scores = byRank.map(_.getDouble(3)).toSeq
      // best possible fusion = rank 1 in BOTH lists = 2/61; worst
      // surfaced = one list at rank 20 = 1/80
      assert(scores.forall(v => v > 0.0 && v <= 2.0 / 61.0 + 1e-15))
      assert(scores == scores.sorted(Ordering[Double].reverse))
    }
    // fusion is real on this fixture: some doc must carry BOTH signals
    // (rrf > 1/61, impossible from a single list)
    assert(rows.exists(_.getDouble(3) > 1.0 / 61.0 + 1e-12))
  }

  test("weighted sample: keys in (0,1], deterministic, biased toward weight") {
    val rows = FilterOps.sampleWeighted(spark, sf).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val k = r.getDouble(3)
      assert(k > 0.0 && k <= 1.0)
    }
    // A-Res keeps heavy (long) docs more often: the sample's mean weight
    // must exceed the corpus mean by a clear margin on this fixture
    val sampleMean = rows.map(_.getLong(2)).sum.toDouble / rows.length
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean * 1.15,
      s"sample mean $sampleMean vs corpus mean $corpusMean")
    // replayable: a second evaluation returns the identical sample
    val again = FilterOps.sampleWeighted(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("semantic dedup: ledger is a partition of the corpus, drops bounded") {
    val rows = SimOps.semanticDedup(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == rows.map(_.getInt(0)).toSeq.sorted)
    val corpus = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == corpus,
      "cells must partition the corpus exactly")
    rows.foreach { r =>
      val (members, pairs, dropped) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      // each dropped doc is the larger end of >=1 pair; a pair drops at
      // most one new doc, and you can never drop the cell's minimum
      assert(dropped <= pairs)
      assert(dropped <= math.max(members - 1, 0))
      assert((pairs == 0) == (dropped == 0))
    }
    // the 0.35 threshold is meaningful on this fixture: some dups exist
    assert(rows.map(_.getLong(2)).sum > 0)
  }
}
