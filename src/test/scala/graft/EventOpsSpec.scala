package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-built event streams where the sf0.1 corpus is too dense to
  * discriminate: the strict-order funnel semantics (out-of-order steps
  * do NOT count), the retention week grid, transition conservation.
  */
class EventOpsSpec extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._

  private def events(rows: Seq[(Long, Long, String, String)]) =
    rows.toDF("event_id", "user_id", "event_type", "tss")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_timestamp(col("tss")).as("ts"), lit(1.0).as("value"))

  test("sequence entropy: deterministic state reads 0, mixed state " +
      "replays the quantized ln sum") {
    // u1: a→b→a→b, u2: a→a. Pairs: (a,b)=2, (a,a)=1, (b,a)=1.
    // From b every move goes to a ⇒ H(b) = 0 exactly (ln 1 = 0).
    // From a: −(2·⌊ln(2/3)·1e6⌋ + 1·⌊ln(1/3)·1e6⌋)/3/1e6, replayed
    // here with the same JVM libm and quantization.
    val df = events(Seq(
      (1L, 1L, "a", "2024-01-01 00:00:01"),
      (2L, 1L, "b", "2024-01-01 00:00:02"),
      (3L, 1L, "a", "2024-01-01 00:00:03"),
      (4L, 1L, "b", "2024-01-01 00:00:04"),
      (5L, 2L, "a", "2024-01-01 00:00:01"),
      (6L, 2L, "a", "2024-01-01 00:00:02")))
    val out = graft.operators.EventOps.sequenceEntropyOn(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val wsumA = 2 * math.floor(math.log(2.0 / 3.0) * 1e6).toLong +
      1 * math.floor(math.log(1.0 / 3.0) * 1e6).toLong
    val hA = -(wsumA.toDouble / 3.0) / 1000000
    assert(out("b") === ((1L, 1L, 0.0, 0.0)))
    assert(out("a")._1 === 3L && out("a")._2 === 2L)
    assert(out("a")._3 === hA)
    assert(out("a")._4 === -(wsumA.toDouble / 4.0) / 1000000)
  }

  test("sequence entropy: seeded random journeys match the cell replay") {
    // brute-force cross-check: random per-user sequences; replay the
    // micro-quantized ln cells in plain Scala (same JVM libm) and
    // demand bit equality per from-state
    val rng = new scala.util.Random(23)
    val types = Array("a", "b", "c", "d")
    val rows = (1L to 40L).flatMap { u =>
      (1 to 1 + rng.nextInt(8)).map { i =>
        (u * 100 + i, u, types(rng.nextInt(4)),
          f"2024-01-01 00:00:${i}%02d")
      }
    }
    val df = events(rows)
    val got = graft.operators.EventOps.sequenceEntropyOn(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // replay: consecutive pairs per user in (ts, event_id) order
    val pairs = rows.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      val seq = rs.sortBy(r => (r._4, r._1)).map(_._3)
      seq.zip(seq.drop(1))
    }
    val tAll = pairs.size.toLong
    pairs.groupBy(_._1).foreach { case (f, ps) =>
      val tot = ps.size.toLong
      val cells = ps.groupBy(_._2).map { case (_, xs) => xs.size.toLong }
      val wsum = cells.map(nft => nft *
        math.floor(math.log(nft.toDouble / tot.toDouble) * 1e6).toLong)
        .sum
      assert(got(f)._1 === tot && got(f)._2 === cells.size.toLong)
      assert(got(f)._3 === -(wsum.toDouble / tot.toDouble) / 1000000,
        s"h mismatch for state $f")
      assert(got(f)._4 === -(wsum.toDouble / tAll.toDouble) / 1000000)
    }
  }

  test("funnel counts only strictly-ordered step sequences") {
    val e = events(Seq(
      // user 1: full ordered funnel
      (1L, 1L, "signup", "2024-01-01 10:00:00"),
      (2L, 1L, "view", "2024-01-01 10:01:00"),
      (3L, 1L, "click", "2024-01-01 10:02:00"),
      (4L, 1L, "purchase", "2024-01-01 10:03:00"),
      // user 2: view BEFORE signup — must stop at signup
      (5L, 2L, "view", "2024-01-01 09:00:00"),
      (6L, 2L, "signup", "2024-01-01 09:30:00"),
      // user 3: signup→view→purchase, no click — stops at view;
      // the purchase must NOT leak past the missing step
      (7L, 3L, "signup", "2024-01-02 08:00:00"),
      (8L, 3L, "view", "2024-01-02 08:10:00"),
      (9L, 3L, "purchase", "2024-01-02 08:20:00"),
      // user 4: never signs up — appears nowhere
      (10L, 4L, "purchase", "2024-01-03 12:00:00")))
    val got = EventOps.funnelOn(e).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("1_signup" -> 3L, "2_view" -> 2L,
      "3_click" -> 1L, "4_purchase" -> 1L))
  }

  test("windowed funnel: the deadline is measured from step 1, inclusive") {
    val e = events(Seq(
      // user 1: view exactly AT the 60-second horizon — counts (<=)
      (1L, 1L, "signup", "2024-01-01 10:00:00"),
      (2L, 1L, "view", "2024-01-01 10:01:00"),
      // user 2: view one second past the horizon — does not count
      (3L, 2L, "signup", "2024-01-01 10:00:00"),
      (4L, 2L, "view", "2024-01-01 10:01:01"),
      // user 3: click within horizon of SIGNUP even though the view was
      // late → click still cannot count (it needs a converted view)
      (5L, 3L, "signup", "2024-01-01 10:00:00"),
      (6L, 3L, "view", "2024-01-01 10:02:00"),
      (7L, 3L, "click", "2024-01-01 10:00:30")))
    val got = EventOps.funnelOn(e, EventOps.FunnelSteps,
        horizonMicros = Some(60L * 1000000L)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("1_signup" -> 3L, "2_view" -> 1L,
      "3_click" -> 0L, "4_purchase" -> 0L))
  }

  test("funnel step times are strictly increasing (same-ts never counts)") {
    val e = events(Seq(
      (1L, 1L, "signup", "2024-01-01 10:00:00"),
      (2L, 1L, "view", "2024-01-01 10:00:00"))) // simultaneous — excluded
    val got = EventOps.funnelOn(e).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("2_view") === 0L)
  }

  test("cohort retention buckets whole weeks from each user's first day") {
    val e = events(Seq(
      (1L, 1L, "view", "2024-01-01 00:00:00"),  // cohort day 0 → week 0
      (2L, 1L, "view", "2024-01-14 00:00:00"),  // offset 13 days → week 1
      (3L, 2L, "view", "2024-01-09 00:00:00"),  // cohort day 8 → week 1
      (4L, 2L, "view", "2024-01-10 00:00:00"))) // offset 1 day → week 0
    val got = EventOps.cohortRetentionOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (1L, 0L) -> 1L))
  }

  test("transitions conserve events and terminate each user at (end)") {
    val e = events(Seq(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 10:01:00"),
      (3L, 1L, "view", "2024-01-01 10:02:00"),
      (4L, 2L, "signup", "2024-01-01 11:00:00")))
    val rows = EventOps.transitionsOn(e).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows === Map(("view", "click") -> 1L, ("click", "view") -> 1L,
      ("view", "(end)") -> 1L, ("signup", "(end)") -> 1L))
    // every event appears exactly once as a transition source
    assert(rows.values.sum === 4L)
    // exactly one (end) per user
    assert(rows.collect { case ((_, "(end)"), n) => n }.sum === 2L)
  }

  test("markov stationary replays hand-computed integer power rounds") {
    // user 1: A,A,B  user 2: A,B,B,A ⇒ counts A→A 1, A→B 2, B→B 1, B→A 1
    // totA=3, totB=2; two exact rounds from uniform 1e6:
    //   r1: A = 1e6·1//3 + 1e6·1//2 = 833333, B = 1e6·2//3 + 1e6//2 = 1166666
    //   r2: A = 833333//3 + 1166666//2 = 861110
    //       B = (833333·2)//3 + 1166666//2 = 1138888
    val e = events(Seq(
      (1L, 1L, "A", "2024-01-01 10:00:00"),
      (2L, 1L, "A", "2024-01-01 10:01:00"),
      (3L, 1L, "B", "2024-01-01 10:02:00"),
      (4L, 2L, "A", "2024-01-01 11:00:00"),
      (5L, 2L, "B", "2024-01-01 11:01:00"),
      (6L, 2L, "B", "2024-01-01 11:02:00"),
      (7L, 2L, "A", "2024-01-01 11:03:00")))
    val got = graft.api.Graft.markovStationary(
      e, "user_id", "event_type", "ts", "event_id", rounds = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq === Seq("B" -> 1138888L, "A" -> 861110L))
  }

  test("markov absorption: expected remaining events on a 2-state chain") {
    // single user A→B→(end): from B one more event (itself), from A two.
    // t₀=0; round 1: t_B=1e6 (no live out-edges), t_A=1e6+0; round 2:
    // t_A=1e6+(1·1e6)//1=2e6 — stable thereafter (8 rounds run)
    val e = events(Seq(
      (1L, 1L, "A", "2024-01-01 10:00:00"),
      (2L, 1L, "B", "2024-01-01 10:01:00")))
    val got = graft.api.Graft.markovAbsorption(
      e, "user_id", "event_type", "ts", "event_id").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq === Seq("A" -> 2000000L, "B" -> 1000000L))
  }

  test("survival curve: tail-cumulative shares at observed lifetimes") {
    // users 1,2 live 0 whole days; user 3 lives 2 days →
    // S(0) = 3/3 = 1000‰, S(2) = 1/3 = 333‰ (floor)
    val e = events(Seq(
      (1L, 1L, "A", "2024-01-01 10:00:00"),
      (2L, 2L, "A", "2024-01-02 09:00:00"),
      (3L, 2L, "A", "2024-01-02 10:00:00"),
      (4L, 3L, "A", "2024-01-01 00:00:00"),
      (5L, 3L, "A", "2024-01-03 00:00:00")))
    val got = graft.api.Graft.survivalCurve(e, "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 3L, 1000L), (2L, 1L, 333L)))
  }

  test("decay score halves milli-unit mass per half-life step, exactly") {
    // newest event anchors age 0; with a 1-day half-life: same-day event
    // decays ×1, a 1-day-old ×1/2, a 3-day-old ×1/8 (floored)
    val e = events(Seq(
      (1L, 1L, "A", "2024-01-04 00:00:00"), // age 0: 10.5 → vu 10500
      (2L, 1L, "A", "2024-01-03 00:00:00"), // age 1: halved
      (3L, 1L, "B", "2024-01-01 00:00:00"))) // age 3: ÷8
      .withColumn("value",
        when(col("event_id") === 3L, 8.008).otherwise(10.5))
    val got = graft.api.Graft.decayScore(
      e, "event_type", "ts", "value", halfLifeDays = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // A: raw 21000, decayed 10500·1000/1 + 10500·1000/2 = 15750000
    // B: 8.008·1000 = 8007.999… in IEEE ⇒ vu floors to 8007 (the same
    //    floor the oracle takes), decayed 8007000 // 8 = 1000875
    assert(got.toSeq === Seq(("A", 2L, 21000L, 15750000L),
      ("B", 1L, 8007L, 1000875L)))
  }

  test("decay score FLOORS negative values (arithmetic shift ≡ DuckDB " +
      "//), no non-negativity contract") {
    // refund-style negative mass: -2.5 → vu -2500 (exact in IEEE);
    // 6 half-life days ⇒ shiftright(-2500000, 6) = floor(-39062.5)
    // = -39063 — truncating DIV would give -39062 and diverge from the
    // oracle's floor-dividing //
    val e = events(Seq(
      (1L, 1L, "C", "2024-01-07 00:00:00"), // the age-0 anchor
      (2L, 1L, "C", "2024-01-01 00:00:00"))) // age 6 days
      .withColumn("value",
        when(col("event_id") === 2L, -2.5).otherwise(0.0))
    val got = graft.api.Graft.decayScore(
      e, "event_type", "ts", "value", halfLifeDays = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("C", 2L, -2500L, -39063L)))
  }

  test("session funnel resets at the session boundary; in-session counts") {
    val e = events(Seq(
      // user 1: signup and view in ONE session (1 min apart)
      (1L, 1L, "signup", "2024-01-01 10:00:00"),
      (2L, 1L, "view", "2024-01-01 10:01:00"),
      // user 2: signup, then view 30 MINUTES later — next session, so
      // the view must NOT count even though it is strictly after
      (3L, 2L, "signup", "2024-01-01 10:00:00"),
      (4L, 2L, "view", "2024-01-01 10:30:00"),
      // user 2's second session also re-counts as a signup session? no —
      // it has no signup, so it contributes nothing
      (5L, 3L, "view", "2024-01-01 09:00:00"))) // view-only session
    val got = EventOps.sessionFunnelOn(e).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("1_signup" -> 2L, "2_view" -> 1L,
      "3_click" -> 0L, "4_purchase" -> 0L))
  }

  test("funnel per-step user sets shrink monotonically on the corpus") {
    val ns = EventOps.funnel(spark, sf).collect()
      .sortBy(_.getString(0)).map(_.getLong(1))
    assert(ns.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel not monotone: ${ns.mkString(",")}")
  }

  test("burstiness: -1 for periodic, positive for bursty, exact moments") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val df = (
      // periodic: gaps 10,10,10 → sigma 0 → B = -1
      (0 to 3).map(i => ("tick", "u1", ts(i * 10L), i.toLong)) ++
      // bursty: gaps 1,1,1,100
      Seq(0L, 1, 2, 3, 103).zipWithIndex.map { case (m, i) =>
        ("burst", "u2", ts(m), 10L + i) }
    ).toDF("g", "subj", "t", "id")
    val out = graft.api.Graft.burstiness(df, "g", "subj", "t", "id")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("tick").getLong(1) === 3L)
    assert(out("tick").getDouble(3) === -1.0)
    val b = out("burst")
    assert(b.getLong(1) === 4L)
    // replay: gaps 1,1,1,100 → n=4 sg=103 sgg=10003
    val varn = 4.0 * 10003 - 103.0 * 103
    val want = (math.sqrt(varn) - 103.0) / (math.sqrt(varn) + 103.0)
    assert(b.getDouble(3) === want)
    assert(b.getDouble(3) > 0.2, "bursty stream must read bursty")
  }

  test("trend: exact slope on a hand-built line, NULL on a point mass") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val df = Seq(
      ("a", ts(0), 1.0), ("a", ts(60), 2.0), ("a", ts(120), 3.0),
      ("b", ts(5), 9.0), ("b", ts(5), 1.0) // one minute only → NULL slope
    ).toDF("g", "t", "v")
    val out = graft.api.Graft.trend(df, "g", "t", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // moments: st=180 sv=6000 stt=18000 stv=480000, n=3
    val slope = (3.0 * 480000 - 180.0 * 6000) /
      (3.0 * 18000 - 180.0 * 180) * 1440 / 1000
    assert(out("a").getLong(1) === 3L)
    assert(out("a").getDouble(2) === slope) // ≈ 24 value-units/day
    assert(out("a").getDouble(3) === 6000.0 / 3 / 1000)
    assert(out("b").isNullAt(2), "degenerate group keeps a NULL slope")
  }
}
