package graft

import graft.operators.JoinOps
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics of the interval-overlap join's two cores, pinned on
  * hand-built fixtures: the strictly-greater gap cut, closed-interval
  * touching endpoints, and bucket-dedup of pairs spanning several bins.
  * (The registered query's end-to-end values are oracle-checked; these are
  * the edge cases a refactor could silently flip.)
  */
class IntervalJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("sessionization cuts strictly past the gap, not at it") {
    val gap = 100L
    // user 1: events at 0, 100 (= gap: SAME session), 201 (> gap after 100:
    // new session). user 2: single event.
    val ev = Seq((1L, 10L, 0L), (1L, 11L, 100L), (1L, 12L, 201L),
      (2L, 20L, 50L)).toDF("user_id", "event_id", "us")
    val sess = JoinOps.sessionIntervals(ev, gap).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(sess === Set((1L, 0L, 100L), (1L, 201L, 201L), (2L, 50L, 50L)))
  }

  test("overlap pairs: touching endpoints count once; disjoint never; bins dedup") {
    val sess = Seq(
      (1L, 1L, 0L, 1000L),    // spans buckets 0..10 at bucket=100
      (2L, 1L, 1000L, 1500L), // touches user 1's end exactly → overlap
      (3L, 1L, 1501L, 1600L), // disjoint from everything
      (4L, 1L, 0L, 2000L)     // spans all: overlaps users 1, 2, 3
    ).toDF("user_id", "sid", "st", "en")
    val pairs = JoinOps.overlapPairs(sess, bucketUs = 100L).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // each overlapping pair appears EXACTLY once despite sharing many bins
    assert(pairs.sorted === Seq((1L, 2L), (1L, 4L), (2L, 4L), (3L, 4L)))
  }

  test("overlap pairs: a dense bucket emits every pair exactly once") {
    // 40 users all overlapping inside a handful of buckets, staggered so
    // pairs differ in which bucket is their FIRST shared one: the
    // first-shared-bucket filter must reproduce all C(40,2) pairs with
    // no duplicates (a regression here would double-count pairs whose
    // intervals share several buckets)
    val sess = (1L to 40L).map(u => (u, 1L, u * 7L, 1000L + u))
      .toDF("user_id", "sid", "st", "en")
    val pairs = JoinOps.overlapPairs(sess, bucketUs = 100L).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(pairs.length === (40 * 39) / 2, "exactly-once emission")
    assert(pairs.distinct.length === pairs.length, "no duplicates")
  }
}
