package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.MapReduce

/** The source-compatible mapreduce() shim: the reference's entry point over
  * arbitrary user lambdas, checked against the declarative formulations of
  * the same programs.
  */
class MapReduceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val lines = Seq(
    "a b b c", "c c c", "a b", "", "d d a"
  ).toDS()

  test("mapreduce wordcount equals the declarative groupBy count") {
    val mr = MapReduce.mapReduce[String, String, Long, (String, Long)](
      lines,
      mapper = l => l.split(" ").iterator.filter(_.nonEmpty).map(_ -> 1L),
      reducer = (w, vs) => Iterator(w -> vs.sum))
      .collect().toMap
    val sql = lines.select(explode(split(col("value"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mr === sql)
  }

  test("map-side combiner does not change the result (combiner law)") {
    def run(c: Option[(String, Iterator[Long]) => IterableOnce[Long]]) =
      MapReduce.mapReduce[String, String, Long, (String, Long)](
        lines.repartition(3),
        mapper = l => l.split(" ").iterator.filter(_.nonEmpty).map(_ -> 1L),
        reducer = (w, vs) => Iterator(w -> vs.sum),
        combiner = c)
        .collect().toMap
    assert(run(None) === run(Some((_, vs) => Iterator(vs.sum))))
  }

  test("reducer can emit zero or many records per key (full MR contract)") {
    val out = MapReduce.mapReduce[String, String, Long, String](
      lines,
      mapper = l => l.split(" ").iterator.filter(_.nonEmpty).map(_ -> 1L),
      reducer = (w, vs) => {
        val n = vs.sum
        if (n < 2) Iterator.empty else Iterator.fill(2)(s"$w:$n")
      })
      .collect().sorted
    // a=3, b=3, c=4 appear twice each; d=2 twice; singletons dropped
    assert(out === Seq("a:3", "a:3", "b:3", "b:3", "c:4", "c:4", "d:2", "d:2"))
  }

  test("counters accumulate task-side increments like MR job counters") {
    val cs = MapReduce.counters(lines)
    val bad = cs.counter("malformed")
    val n = lines.mapPartitions { it =>
      it.map { l => if (l.isEmpty) bad.add(1); l }
    }.count()
    assert(n === 5)
    assert(cs.value("malformed") === 1)
  }

  test("mapReduceSorted streams each key's values in order (secondary sort)") {
    val events = Seq(
      (1L, 5, "e"), (1L, 1, "a"), (1L, 3, "c"),
      (2L, 2, "x"), (2L, 1, "w")
    ).toDS()
    val out = MapReduce.mapReduceSorted[(Long, Int, String),
        Long, (Int, String), (Long, String)](
      events,
      mapper = e => Iterator(e._1 -> (e._2, e._3)),
      reducer = (uid, vs) => Iterator(uid -> vs.map(_._2).mkString("")))
      .collect().toMap
    assert(out === Map(1L -> "ace", 2L -> "wx"))
  }

  test("mapReduceSorted reducer may stop early without corrupting groups") {
    val events = Seq(
      (1L, 2, "b"), (1L, 1, "a"), (2L, 1, "y")
    ).toDS()
    val out = MapReduce.mapReduceSorted[(Long, Int, String),
        Long, (Int, String), (Long, String)](
      events,
      mapper = e => Iterator(e._1 -> (e._2, e._3)),
      // take only the FIRST value per key (min by sort order)
      reducer = (uid, vs) => Iterator(uid -> vs.next()._2))
      .collect().toMap
    assert(out === Map(1L -> "a", 2L -> "y"))
  }

  test("mapReduceSorted supports reducers returning a LAZY view over values") {
    // Regression: the per-key drain used to run right after reducer()
    // returned, emptying any lazy result built over vs. A streaming
    // reducer `vs.map(f)` — the giant-key use case — must work.
    val events = Seq(
      (1L, 2, "b"), (1L, 1, "a"), (1L, 3, "c"),
      (2L, 1, "y"), (2L, 2, "z")
    ).toDS()
    val out = MapReduce.mapReduceSorted[(Long, Int, String),
        Long, (Int, String), (Long, String)](
      events,
      mapper = e => Iterator(e._1 -> (e._2, e._3)),
      // lazy: no materialization — output iterator pulls vs on demand
      reducer = (uid, vs) => vs.map { case (_, s) => uid -> s.toUpperCase })
      .collect().sorted
    assert(out === Seq(1L -> "A", 1L -> "B", 1L -> "C", 2L -> "Y", 2L -> "Z"))
  }

  test("mapReduceSorted lazy reducer that stops early leaves later keys intact") {
    val events = Seq(
      (1L, 3, "c"), (1L, 1, "a"), (1L, 2, "b"),
      (2L, 1, "x"), (2L, 2, "y")
    ).toDS()
    val out = MapReduce.mapReduceSorted[(Long, Int, String),
        Long, (Int, String), (Long, String)](
      events,
      mapper = e => Iterator(e._1 -> (e._2, e._3)),
      // lazy AND truncated: take the first 2 values per key as a view
      reducer = (uid, vs) => vs.take(2).map { case (_, s) => uid -> s })
      .collect().sorted
    assert(out === Seq(1L -> "a", 1L -> "b", 2L -> "x", 2L -> "y"))
  }

  test("combiner folds incrementally: per-key buffer stays bounded") {
    // 1 key × 10k mapped values through a partition; with flushAt=32 the
    // combiner must see many small batches, never the whole stream.
    val batches = new org.apache.spark.util.LongAccumulator
    spark.sparkContext.register(batches, "combinerBatches")
    val oversize = new org.apache.spark.util.LongAccumulator
    spark.sparkContext.register(oversize, "oversizeBatches")
    val big = Seq.fill(100)("k " * 100).toDS().repartition(1)
    val out = MapReduce.mapReduce[String, String, Long, (String, Long)](
      big,
      mapper = l => l.split(" ").iterator.filter(_.nonEmpty).map(_ -> 1L),
      reducer = (w, vs) => Iterator(w -> vs.sum),
      combiner = Some((_, vs) => {
        val seq = vs.toSeq
        batches.add(1)
        if (seq.length > 64) oversize.add(1)
        Iterator(seq.sum)
      }))
      .collect().toMap
    assert(out === Map("k" -> 10000L))
    assert(batches.value > 10, s"expected many small combiner batches, got ${batches.value}")
    assert(oversize.value === 0, s"combiner saw ${oversize.value} unbounded batches")
  }

  test("coGroup presents both tagged value streams with full-outer keys") {
    val clicks = Seq((1L, 10L), (1L, 11L), (3L, 30L)).toDS()
    val buys = Seq((1L, 100L), (2L, 200L), (2L, 201L)).toDS()
    val out = MapReduce.coGroup[(Long, Long), (Long, Long), Long,
      (Long, Long, Long)](
      clicks, buys, _._1, _._1,
      (k, cs, ps) => Iterator((k, cs.size.toLong, ps.size.toLong)))
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((2L, 1L)), "both sides present")
    assert(out(2L) === ((0L, 2L)), "right-only key still reaches the reducer")
    assert(out(3L) === ((1L, 0L)), "left-only key still reaches the reducer")
  }

  test("chained jobs: output of one mapreduce feeds the next") {
    // job 1: wordcount; job 2: histogram of counts
    val counts = MapReduce.mapReduce[String, String, Long, (String, Long)](
      lines,
      mapper = l => l.split(" ").iterator.filter(_.nonEmpty).map(_ -> 1L),
      reducer = (w, vs) => Iterator(w -> vs.sum))
    val hist = MapReduce.mapReduce[(String, Long), Long, Long, (Long, Long)](
      counts,
      mapper = kv => Iterator(kv._2 -> 1L),
      reducer = (n, vs) => Iterator(n -> vs.sum))
      .collect().toMap
    assert(hist === Map(2L -> 1L, 3L -> 2L, 4L -> 1L)) // d=2; a,b=3; c=4
  }

  test("reservoir sample: golden hand-computed bottom-k, exact-k per " +
      "group, partition-invariant, short groups whole") {
    // priorities replay by hand: h(id) = (id·1103515245 + 12345) mod
    // (2³¹−1) — large multiplier, so priorities wrap (NOT monotone in id)
    def h(id: Long): Long = ((id % 2147483647L) * 1103515245L + 12345L) %
      2147483647L
    val rows = (1L to 100L).map(i => (if (i % 2 == 0) "even" else "odd", i))
      .toDF("g", "id")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.api.Graft.reservoirSample(df, Seq("g"), "id", k = 3)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2))
    val got = run(rows)
    // golden: the 3 smallest priorities among each parity class
    def expect(g: String, ids: Seq[Long]) =
      ids.map(i => (h(i), i)).sorted.take(3).map { case (p, i) => (g, p, i) }
    val want = (expect("even", (2L to 100L by 2)) ++
      expect("odd", (1L to 99L by 2))).sortBy(x => (x._1, x._2))
    assert(got.toSeq === want)
    // partition layout is not observable (associative merge)
    assert(run(rows.repartition(13)).toSeq === got.toSeq)
    // a group smaller than k returns every row
    val tiny = Seq(("g", 7L), ("g", 8L)).toDF("g", "id")
    assert(graft.api.Graft.reservoirSample(tiny, Seq("g"), "id", k = 5)
      .count() === 2L)
    // a different seed draws a different sample (same sizes)
    val other = graft.api.Graft
      .reservoirSample(rows, Seq("g"), "id", k = 3, seed = 42L)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(other.length === 6)
    assert(other.toSet != got.map(x => (x._1, x._3)).toSet)
  }
}
