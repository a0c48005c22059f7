package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed reservoir sample of k rows per group as a typed
  * `Aggregator` — the classic MR "take a uniform sample without loading
  * the group" idiom, in its ASSOCIATIVE form.
  *
  * Vitter's Algorithm R is sequential (the admission probability k/i
  * depends on arrival order), so a literal port would make the sample
  * depend on Spark's partition order — which is not a contract. The
  * order-sampling formulation (Rosén 1997; Cohen–Kaplan's bottom-k
  * sketches, both public) is the distributed equivalent: give every row
  * a priority and keep the k smallest. With i.i.d. random priorities
  * the bottom-k IS a uniform k-sample; with a deterministic seeded hash
  * as the priority the sample is additionally REPRODUCIBLE across runs,
  * partitionings, and engines (the DuckDB oracle replays it with a
  * window — same rows, bit for bit).
  *
  * Scale shape: state is O(k) per (group, partition) regardless of row
  * count, Catalyst plans it as a partial aggregation (map-side bottom-k,
  * one k-sized buffer per group through the shuffle), and merge is
  * concat+trim — associative and commutative, so any merge tree yields
  * the same reservoir. The oracle's window formulation sorts the whole
  * group; this Aggregator is what survives when the group is 10¹⁰ rows.
  *
  * Inputs are (priority, id) pairs; ties on priority break by id, so the
  * reservoir is total-order deterministic whenever ids are unique.
  * Amortization: the buffer appends until 2k then sorts+trims to k, so
  * a row costs O(1) amortized and O(log k) only at trim boundaries (the
  * [[KllBuf]] slack discipline).
  */
final case class ResBuf(items: Vector[(Long, Long)])

class ReservoirK(k: Int)
  extends Aggregator[(Long, Long), ResBuf, Seq[(Long, Long)]] {
  require(k >= 1, s"reservoir size k must be >= 1, got $k")

  def zero: ResBuf = ResBuf(Vector.empty)

  private def trim(items: Vector[(Long, Long)]): Vector[(Long, Long)] =
    if (items.length <= k) items else items.sorted.take(k)

  def reduce(b: ResBuf, x: (Long, Long)): ResBuf = {
    val it = b.items :+ x
    ResBuf(if (it.length >= 2 * k) trim(it) else it)
  }

  def merge(a: ResBuf, b: ResBuf): ResBuf = ResBuf(trim(a.items ++ b.items))

  def finish(r: ResBuf): Seq[(Long, Long)] = trim(r.items).sorted

  def bufferEncoder: Encoder[ResBuf] = Encoders.product[ResBuf]
  def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
