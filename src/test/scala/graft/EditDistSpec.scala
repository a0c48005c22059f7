package graft

import graft.operators.JoinOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pair-for-pair equality of the FastSS deletion-neighborhood edit-distance
  * join against a brute-force all-pairs reference — the same
  * exactness-despite-prefiltering proof style as PrefixJoinSpec, for
  * Levenshtein distance instead of Jaccard.
  */
class EditDistSpec extends AnyFunSuite {
  import TestSpark._

  private def brute(df: org.apache.spark.sql.DataFrame,
      d: Int = 1): Set[(Long, Long, Long)] = {
    val a = df.select(col("id").as("a"), col("str").as("sa"))
    val b = df.select(col("id").as("b"), col("str").as("sb"))
    a.crossJoin(b)
      .filter(col("a") < col("b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")).cast("long"))
      .filter(col("dist") <= d)
      .select(col("a"), col("b"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def fast(df: org.apache.spark.sql.DataFrame,
      d: Int = 1): Set[(Long, Long, Long)] =
    JoinOps.editDistancePairsOn(df, "id", "str", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("deletion-neighborhood join equals brute force on an adversarial corpus") {
    // every edit class: substitution, deletion, insertion, identical
    // strings (dist 0), empty vs 1-char, multi-byte unicode, and far-apart
    // strings that must NOT pair
    val rows = Seq(
      1L -> "kitten", 2L -> "sitten", // substitution
      3L -> "kitte",                  // deletion of 1
      4L -> "kittens",                // insertion on 1
      5L -> "kitten",                 // identical to 1 (dist 0)
      6L -> "",                       // empty
      7L -> "a",                      // 1 insert from empty
      8L -> "ab",                     // 1 insert from "a"
      9L -> "café", 10L -> "cafe", // unicode substitution
      11L -> "zzzzzz",                // near nothing
      12L -> "sittin")                // chain: 1 sub from "sitten"
    import spark.implicits._
    val df = rows.toDF("id", "str")
    val (f, b) = (fast(df), brute(df))
    assert(f === b, s"missing=${b diff f} extra=${f diff b}")
    // the fixture exercises every edit class: at least one dist-0 pair and
    // the empty↔1-char insertion must be present
    assert(b.contains((1L, 5L, 0L)) && b.contains((6L, 7L, 1L)))
  }

  test("d=2 neighborhoods equal brute force across every two-edit class") {
    import spark.implicits._
    // pairs at exactly distance 2 in each composition: 2 subs, 2 dels,
    // 2 inserts, sub+del, sub+insert — plus distance-3 strings that the
    // d=2 join must exclude
    val rows = Seq(
      1L -> "abcdef",
      2L -> "axcxef",   // 2 substitutions of 1
      3L -> "abcd",     // 2 deletions of 1
      4L -> "abcdefgh", // 2 insertions on 1
      5L -> "axcde",    // sub + del of 1
      6L -> "axbcdefg", // sub + insert of 1
      7L -> "xycxef",   // 1 sub from 2, 3 from 1: boundary exclusion
      8L -> "",
      9L -> "ab")       // 2 inserts from empty
    val df = rows.toDF("id", "str")
    val (f, b) = (fast(df, 2), brute(df, 2))
    assert(b.contains((1L, 2L, 2L)) && b.contains((1L, 3L, 2L)) &&
      b.contains((1L, 4L, 2L)) && b.contains((1L, 5L, 2L)) &&
      b.contains((8L, 9L, 2L)))
    assert(!b.exists(p => p._1 == 1L && p._2 == 7L))
    assert(f === b, s"missing=${b diff f} extra=${f diff b}")
  }

  test("d=2 equals brute force on the fixed-width key corpus") {
    import spark.implicits._
    val df = (0L until 200L).map(i => i -> f"row#$i%05d").toDF("id", "str")
    val (f, b) = (fast(df, 2), brute(df, 2))
    assert(b.nonEmpty)
    assert(f === b, s"missing=${(b diff f).take(5)} extra=${(f diff b).take(5)}")
  }

  test("d=3 PassJoin equals brute force across every three-edit class") {
    import spark.implicits._
    // distance-exactly-3 pairs in each composition: 3 subs, 3 dels,
    // 3 inserts, 2 sub + del, sub + 2 inserts — plus a distance-4 string
    // the d=3 join must exclude, empty-vs-3, and short strings that
    // exercise the empty-segment path (len < d+1)
    val rows = Seq(
      1L -> "abcdefgh",
      2L -> "axcxexgh",    // 3 substitutions of 1
      3L -> "abcde",       // 3 deletions of 1
      4L -> "abcdefghijk", // 3 insertions on 1
      5L -> "axcxegh",     // 2 subs + 1 del of 1
      6L -> "axbcdefghi",  // 1 sub + 2 inserts of 1
      7L -> "wxyzefgh",    // 4 subs from 1: boundary exclusion
      8L -> "",
      9L -> "abc",         // 3 inserts from empty; empty-segment regime
      10L -> "ab", 11L -> "xy", // short strings, all-pairs-at-length regime
      12L -> "zzzzzzzzzzzzzzzz") // far from everything
    val df = rows.toDF("id", "str")
    val (f, b) = (fast(df, 3), brute(df, 3))
    assert(b.contains((1L, 2L, 3L)) && b.contains((1L, 3L, 3L)) &&
      b.contains((1L, 4L, 3L)) && b.contains((1L, 5L, 3L)) &&
      b.contains((8L, 9L, 3L)) && b.contains((10L, 11L, 2L)))
    assert(!b.exists(p => p._1 == 1L && p._2 == 7L))
    assert(f === b, s"missing=${b diff f} extra=${f diff b}")
  }

  test("d=3 equals brute force on the fixed-width key corpus (registered shape)") {
    import spark.implicits._
    // zero-padded suffixes: every pair differs in <= 5 digit positions, so
    // the d=3 cut is exercised on a DENSE true-pair corpus where shared
    // segments (the constant prefix) put every row in one candidate block
    val df = (0L until 150L).map(i => i -> f"sup#$i%05d").toDF("id", "str")
    val (f, b) = (fast(df, 3), brute(df, 3))
    assert(b.nonEmpty)
    assert(f === b, s"missing=${(b diff f).take(5)} extra=${(f diff b).take(5)}")
  }

  test("d=4 PassJoin equals brute force (generality past the asked-for 3)") {
    import spark.implicits._
    val rows = Seq(
      1L -> "abcdefghij",
      2L -> "axcxexgxij",  // 4 subs
      3L -> "abcdef",      // 4 dels
      4L -> "abcdefghijklmn", // 4 inserts
      5L -> "vwxyzfghij",  // 5 subs: excluded
      6L -> "", 7L -> "abcd")
    val df = rows.toDF("id", "str")
    val (f, b) = (fast(df, 4), brute(df, 4))
    assert(b.contains((1L, 2L, 4L)) && b.contains((1L, 3L, 4L)) &&
      b.contains((1L, 4L, 4L)) && b.contains((6L, 7L, 4L)))
    assert(!b.exists(p => p._1 == 1L && p._2 == 5L))
    assert(f === b, s"missing=${b diff f} extra=${f diff b}")
  }

  test("deletion-neighborhood join equals brute force on near-identical id strings") {
    // the registered query's shape: fixed-width zero-padded keys where
    // single-DIGIT substitutions dominate and deletion variants collide
    // heavily across rows
    import spark.implicits._
    val df = (0L until 300L).map(i => i -> f"row#$i%06d").toDF("id", "str")
    val (f, b) = (fast(df), brute(df))
    assert(b.nonEmpty)
    assert(f === b, s"missing=${(b diff f).take(5)} extra=${(f diff b).take(5)}")
  }
}
