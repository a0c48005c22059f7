package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable streaming quantile sketch in the KLL / MRL family
  * (Karnin-Lang-Liberty 2016; Manku-Rajagopalan-Lindsay 1998): a stack of
  * fixed-width compactors where level i holds items of weight 2^i, and an
  * overflowing level sorts itself and promotes every other item to level
  * i+1. Distributed shape: this is a typed `Aggregator`, so Catalyst
  * plans map-side partial aggregation — each (key, partition) ships ONE
  * O(k·log(n/k))-sized buffer through the shuffle regardless of row
  * count, the property that makes percentile computation feasible where
  * [[graft.api.Graft.exactQuantiles]]' total-order selection would need a
  * full sort of 100 TB.
  *
  * Determinism: classic KLL flips a random coin per compaction to choose
  * odd or even survivors; this implementation derives the coin from a
  * per-level compaction counter (alternating parity). Given the same
  * insertion and merge order the sketch is bit-reproducible, but Spark's
  * partition order is not a contract, so the registered query is
  * rows-only and the accuracy/merge-law guarantees live in PropertySpec
  * (rank error ≤ [[KllSketch.rankEps]] under every merge shape tested).
  *
  * Error bound: with uniform width k and H ≈ log2(n/k) levels the rank
  * error is at most Σ_{i<H} 2^i/2 · (compactions at i) ≤ H·n/(2k) in the
  * worst case, i.e. ε ≈ H/(2k) of n per level pair — for k = 512 and
  * n = 10⁹, H ≈ 21 gives ε ≈ 2%. The KLL (2/3)-capacity-decay refinement
  * would shave the log factor; uniform width is kept for the
  * weight-conservation invariant the spec pins (Σ 2^i·|level_i| +
  * buffered = n exactly).
  */
/** `m0` is the count of VALID entries in `levels(0)`: per-row inserts
  * write into pre-grown slack (capacity k+1) instead of reallocating the
  * array, so a row costs O(1) amortized rather than the O(k) copy the
  * `:+` formulation paid (the r9/r10 watch item). Every boundary —
  * merge, finish, compaction — first normalizes `levels(0)` back to
  * exactly `m0` entries, so the slack is never observable outside
  * [[KllSketch.reduce]]; levels ≥ 1 are always exact-length.
  */
final case class KllBuf(levels: Array[Array[Double]], n: Long,
    coins: Array[Int], m0: Int)

class KllSketch(k: Int, quantiles: Array[Double])
  extends Aggregator[Double, KllBuf, Array[Double]] {
  require(k >= 8, s"compactor width k must be >= 8, got $k")
  require(quantiles.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be in [0,1]: ${quantiles.mkString(",")}")

  def zero: KllBuf = KllBuf(Array(Array.empty[Double]), 0L, Array(0), 0)

  def reduce(b: KllBuf, x: Double): KllBuf = {
    var lv = b.levels
    if (b.m0 >= lv(0).length) {
      // grow level-0 to full capacity once per ≥k inserts — the only
      // copies on the insert path, so appends are O(1) amortized
      lv = lv.clone()
      lv(0) = java.util.Arrays.copyOf(lv(0), k + 1)
    }
    lv(0)(b.m0) = x
    val nb = KllBuf(lv, b.n + 1, b.coins, b.m0 + 1)
    if (nb.m0 > k) compact(normalized(nb)) else nb
  }

  /** Trim level-0 to its `m0` valid entries (no-op when already exact). */
  private def normalized(b: KllBuf): KllBuf =
    if (b.m0 == b.levels(0).length) b
    else {
      val lv = b.levels.clone()
      lv(0) = java.util.Arrays.copyOf(lv(0), b.m0)
      KllBuf(lv, b.n, b.coins, b.m0)
    }

  def merge(a0: KllBuf, b0: KllBuf): KllBuf = {
    val a = normalized(a0); val b = normalized(b0)
    val h = math.max(a.levels.length, b.levels.length)
    val lv = Array.tabulate(h) { i =>
      val xa = if (i < a.levels.length) a.levels(i) else Array.empty[Double]
      val xb = if (i < b.levels.length) b.levels(i) else Array.empty[Double]
      xa ++ xb
    }
    val coins = Array.tabulate(h) { i =>
      (if (i < a.coins.length) a.coins(i) else 0) +
        (if (i < b.coins.length) b.coins(i) else 0)
    }
    compact(KllBuf(lv, a.n + b.n, coins, lv(0).length))
  }

  /** Collapse every level over capacity, bottom-up (a promotion can
    * overflow the level above). Two weight-w items become one weight-2w
    * item, so Σ 2^i·|level_i| is invariant — total weight stays n.
    * Survivor parity alternates via the per-level compaction counter:
    * deterministic, and unbiased across compactions like KLL's coin.
    */
  private def compact(b: KllBuf): KllBuf = {
    // callers pass a NORMALIZED buffer (level-0 exact-length)
    var lv = b.levels
    var coins = b.coins
    var i = 0
    while (i < lv.length) {
      if (lv(i).length > k) {
        val sorted = lv(i).sorted
        // odd length: the unpaired item (deterministically the last,
        // keeping parity independent of value ties) stays at level i
        val even = sorted.length % 2 == 0
        val keepLo = if (even) Array.empty[Double]
          else Array(sorted(sorted.length - 1))
        val off = coins(i) % 2 // alternate odd/even survivors
        val promoted = Array.tabulate((sorted.length - (if (even) 0 else 1))
          / 2)(j => sorted(2 * j + off))
        if (i + 1 >= lv.length) {
          lv = lv :+ Array.empty[Double]
          coins = coins :+ 0
        }
        lv(i) = keepLo
        lv(i + 1) = lv(i + 1) ++ promoted
        coins(i) += 1
      }
      i += 1
    }
    KllBuf(lv, b.n, coins, lv(0).length)
  }

  /** Weighted order statistics: expand (value, 2^level) pairs, sort by
    * value, walk cumulative weight to each target rank ceil(q·n). */
  def finish(b0: KllBuf): Array[Double] = {
    if (b0.n == 0) return quantiles.map(_ => Double.NaN)
    val b = normalized(b0)
    val items = b.levels.iterator.zipWithIndex.flatMap { case (arr, i) =>
      arr.iterator.map(v => (v, 1L << i))
    }.toArray.sortBy(_._1)
    quantiles.map { q =>
      val target = math.max(1L, math.ceil(q * b.n).toLong)
      var cum = 0L
      var j = 0
      while (j < items.length && cum + items(j)._2 < target) {
        cum += items(j)._2
        j += 1
      }
      items(math.min(j, items.length - 1))._1
    }
  }

  def bufferEncoder: Encoder[KllBuf] = Encoders.product[KllBuf]
  def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object KllSketch {
  /** Rank-error budget the PropertySpec asserts (k = 512 at test scale —
    * generous vs the H/(2k) analysis, tight enough to catch a broken
    * compactor, which shows up as 10-50× this). */
  val rankEps = 0.05
}
