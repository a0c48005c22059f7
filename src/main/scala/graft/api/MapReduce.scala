package graft.api

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.util.LongAccumulator

/** Source-compatible MapReduce surface: the reference engine's entry point
  * (`mapreduce(input, mapper, reducer[, combiner])` over user-supplied
  * functions) re-expressed on Datasets, so mapper/reducer code ports 1:1
  * while Spark plans the shuffle.
  *
  * This is the ONLY place in graft that deliberately uses the typed
  * lambda path instead of Column expressions: its entire point is to run
  * arbitrary user functions, exactly like the reference. Everything that
  * has a declarative formulation belongs in the operator families, which
  * Catalyst can optimize; this shim is the escape hatch with MR semantics.
  *
  * Scale notes: the shuffle is `groupByKey` (hash partition by key, the MR
  * contract); the optional combiner runs per input partition BEFORE the
  * shuffle (map-side combine, MRDP ch.2) folding incrementally per key —
  * same memory model as Hadoop's in-mapper combining, O(distinct keys ×
  * small constant) regardless of how much output the mapper expands to.
  */
object MapReduce {

  /** `map(k1,v1) → list(k2,v2)`; shuffle by k2; `reduce(k2, values) →
    * list(out)` — Dean & Ghemawat's contract, verbatim.
    */
  def mapReduce[I, K, V, O](
      input: Dataset[I],
      mapper: I => IterableOnce[(K, V)],
      reducer: (K, Iterator[V]) => IterableOnce[O],
      combiner: Option[(K, Iterator[V]) => IterableOnce[V]] = None)(
      implicit kev: Encoder[(K, V)], ke: Encoder[K],
      oe: Encoder[O]): Dataset[O] = {
    val mapped = input.flatMap(mapper)
    val preShuffle = combiner match {
      case None => mapped
      case Some(c) =>
        mapped.mapPartitions { it =>
          // Incremental in-mapper combining: each key buffers at most
          // `flushAt` pending values before the combiner collapses them, so
          // memory is O(distinct keys × flushAt), not O(partition output) —
          // a flatMap-expanding mapper can't OOM the buffer. Relies on the
          // standard combiner contract (associative, may run 0..n times).
          val flushAt = 32
          val groups = mutable.LinkedHashMap.empty[K, mutable.ArrayBuffer[V]]
          it.foreach { case (k, v) =>
            val buf = groups.getOrElseUpdate(k, mutable.ArrayBuffer.empty[V])
            buf += v
            if (buf.length >= flushAt) {
              val folded = mutable.ArrayBuffer.from(c(k, buf.iterator))
              groups(k) = folded
            }
          }
          groups.iterator.flatMap { case (k, vs) =>
            c(k, vs.iterator).iterator.map(k -> _)
          }
        }
    }
    preShuffle
      .groupByKey(_._1)(ke)
      .flatMapGroups((k: K, rows: Iterator[(K, V)]) =>
        reducer(k, rows.map(_._2)).iterator)(oe)
  }

  /** Multi-input reduce (Hadoop's reduce-side join / CoGroup primitive,
    * MRDP ch.5): two tagged inputs shuffle on the SAME key and one
    * reducer sees both value iterators side by side. Keys present in
    * either input reach the reducer (the other iterator is empty) — the
    * full-outer contract. Like MR, neither iterator has an order
    * guarantee; sort inside the reducer if order matters. Scale: both
    * sides hash-partition on the key, the reducer streams — the honest
    * reduce-side join; use a broadcast join instead when one side is
    * small.
    */
  def coGroup[A, B, K, O](
      left: Dataset[A], right: Dataset[B],
      keyL: A => K, keyR: B => K,
      reducer: (K, Iterator[A], Iterator[B]) => IterableOnce[O])(
      implicit ke: Encoder[K], oe: Encoder[O]): Dataset[O] =
    left.groupByKey(keyL)(ke)
      .cogroup(right.groupByKey(keyR)(ke))(reducer)(oe)

  /** Secondary sort (MRDP ch.4 composite-key pattern): the reducer sees
    * each key's values in ascending value order (Spark's natural column
    * ordering of V). Implemented the way Hadoop does it —
    * partition by key, sort WITHIN partitions by (key, value), then a
    * single streaming pass groups consecutive equal keys — so no group is
    * ever collected into memory: the reducer consumes a lazy iterator in
    * sort order, which is what makes giant keys (the reason secondary sort
    * exists) safe at scale.
    */
  def mapReduceSorted[I, K, V, O](
      input: Dataset[I],
      mapper: I => IterableOnce[(K, V)],
      reducer: (K, Iterator[V]) => IterableOnce[O],
      numPartitions: Int = 0)(
      implicit kev: Encoder[(K, V)], oe: Encoder[O]): Dataset[O] = {
    import org.apache.spark.sql.functions.col
    val mapped = input.flatMap(mapper)
    val parts = if (numPartitions > 0) numPartitions
      else mapped.sparkSession.sessionState.conf.numShufflePartitions
    mapped
      .repartition(parts, col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"))
      .mapPartitions { (it: Iterator[(K, V)]) =>
        val rows = it.buffered
        new Iterator[O] {
          private var out: Iterator[O] = Iterator.empty
          // The current key's value iterator. It is drained only AFTER `out`
          // is exhausted, so a reducer may return a lazy view over its values
          // (e.g. `(k, vs) => vs.map(f)`) — the streaming case this API
          // exists for — without the drain stealing them first.
          private var pendingVs: Iterator[V] = Iterator.empty
          @annotation.tailrec
          private def advance(): Unit =
            if (!out.hasNext) {
              while (pendingVs.hasNext) pendingVs.next() // skip unconsumed values
              if (rows.hasNext) {
                val k = rows.head._1
                val vs = new Iterator[V] {
                  def hasNext = rows.hasNext && rows.head._1 == k
                  def next() = rows.next()._2
                }
                pendingVs = vs
                out = reducer(k, vs).iterator
                advance()
              }
            }
          def hasNext = { advance(); out.hasNext }
          def next() = { advance(); out.next() }
        }
      }
  }

  /** MR job counters (the reference's side-stats surface): named
    * LongAccumulators incremented from task-side code, read on the driver.
    */
  final class Counters(ds: Dataset[_]) {
    private val sc = ds.sparkSession.sparkContext
    private val acc = mutable.Map.empty[String, LongAccumulator]
    def counter(name: String): LongAccumulator =
      acc.getOrElseUpdate(name, sc.longAccumulator(name))
    def value(name: String): Long = acc(name).value
  }

  def counters(ds: Dataset[_]): Counters = new Counters(ds)
}
