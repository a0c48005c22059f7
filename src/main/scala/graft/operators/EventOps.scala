package graft.operators

import graft.{OpFamily, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event/product analytics over the events stream — the ordered-behavior
  * queries (funnel conversion, cohort retention, transition matrix) that
  * sit one level above windowed aggregation: every marketing/product
  * pipeline runs these, and none is expressible as a single groupBy.
  *
  * Scale shape: everything is keyed by user_id — the sequential-funnel
  * chain is groupBy(user)+join(user) stages that AQE co-partitions (one
  * logical shuffle of the events table reused down the chain via
  * ReuseExchange), retention is two user-keyed aggregates, transitions
  * is one user-partitioned window. Nothing is event×event; output is
  * bounded (steps / cohort-week grid / 5×6 transition matrix).
  */
object EventOps extends OpFamily {

  /** events with ts already truncated to microseconds (Tables.events).  */
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))

  /** STRICTLY-ORDERED funnel signup → view → click → purchase: a user
    * converts step k only with an event at step k STRICTLY AFTER their
    * step-(k−1) conversion time (the earliest valid one — min over
    * qualifying events, the standard unordered-events funnel semantics).
    * Four sequential conditional-min aggregates; each step's user set is
    * a subset of the previous, pinned by the spec's monotonicity case.
    */
  def funnel(s: SparkSession, d: String): DataFrame = funnelOn(ev(s, d))

  private[graft] val FunnelSteps =
    Seq("signup", "view", "click", "purchase")

  /** Per-user funnel step conversion times (user_id, t1..tk) — the
    * chained-window core shared by [[funnelOn]] and [[timeToConvertOn]].
    * ONE shuffle for any step count: each step time is a whole-partition
    * window min over the same user_id partitioning (consecutive Window
    * stages reuse the exchange — the first cut's groupBy+join chain
    * planned 17 static exchanges), conditions chain t(k) on t(k−1) with
    * null propagation doing the gating (ts > null is null, min ignores
    * it).
    */
  private[graft] def stepTimesOn(e: DataFrame, steps: Seq[String],
      horizonMicros: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty && steps.size == steps.distinct.size,
      s"funnel steps must be non-empty and distinct: $steps")
    val w = Window.partitionBy(col("user_id"))
    val ts = steps.indices.map(i => s"t${i + 1}")
    val withT = steps.zipWithIndex.foldLeft(e) { case (df, (st, i)) =>
      val gate = col("event_type") === st &&
        (if (i == 0) lit(true) else {
          val ordered = col("ts") > col(ts(i - 1))
          // conversion deadline: step k counts only within the horizon
          // of the user's STEP-1 time (exact epoch-micro comparison)
          horizonMicros.fold(ordered)(h => ordered &&
            unix_micros(col("ts")) - unix_micros(col(ts.head)) <= lit(h))
        })
      df.withColumn(ts(i), min(when(gate, col("ts"))).over(w))
    }
    withT
      .groupBy(col("user_id")) // same key: no second shuffle
      .agg(max(col(ts.head)).as(ts.head),
        ts.tail.map(t => max(col(t)).as(t)): _*)
  }

  private[graft] def funnelOn(e: DataFrame,
      steps: Seq[String] = FunnelSteps,
      horizonMicros: Option[Long] = None): DataFrame = {
    val ts = steps.indices.map(i => s"t${i + 1}")
    val labels = steps.zipWithIndex.map { case (st, i) => s"${i + 1}_$st" }
    stepTimesOn(e, steps, horizonMicros)
      .agg(count(col(ts.head)).as(labels.head),
        ts.tail.zip(labels.tail)
          .map { case (t, l) => count(col(t)).as(l) }: _*)
      .unpivot(Array.empty, "step", "n_users")
      .orderBy(col("step"))
  }

  /** [[funnel]] with a CONVERSION DEADLINE — every later step must land
    * within 72 hours of the user's step-1 time, the windowed-conversion
    * semantics every product-analytics funnel defaults to (the unbounded
    * funnel saturates on long-lived users; the deadline is what makes
    * cohort comparisons honest). Same one-shuffle chained-window plan.
    */
  def funnelWindowed(s: SparkSession, d: String): DataFrame =
    funnelOn(ev(s, d), FunnelSteps, Some(72L * 3600L * 1000000L))

  /** Conversion LATENCY per funnel transition — how long converting
    * users take between consecutive steps: n_users, min / exact median
    * / max seconds (integral epoch-micro differences DIV 10⁶; the
    * median is the lower-middle sorted element, position (n+1) DIV 2,
    * so no float interpolation). The per-transition deltas melt out of
    * ONE [[stepTimesOn]] pass (no re-scan per transition); ranking is a
    * WindowGroupLimit-sized sort over the bounded converting-user set.
    */
  def timeToConvert(s: SparkSession, d: String): DataFrame =
    timeToConvertOn(ev(s, d))

  private[graft] def timeToConvertOn(e: DataFrame,
      steps: Seq[String] = FunnelSteps): DataFrame = {
    val st = stepTimesOn(e, steps)
    val pairs = steps.indices.dropRight(1).map { i =>
      struct(
        lit(s"${i + 1}_${steps(i)}->${i + 2}_${steps(i + 1)}")
          .as("transition"),
        // positive deltas (strict > in the gate) so DIV = floor, matching
        // DuckDB's // ; a Spark `/` here would be a double divide
        expr(s"(unix_micros(t${i + 2}) - unix_micros(t${i + 1})) " +
          "DIV 1000000").as("delta_s"))
    }
    val wT = Window.partitionBy(col("transition")).orderBy(col("delta_s"))
    st.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.transition").as("transition"),
        col("p.delta_s").as("delta_s"))
      .filter(col("delta_s").isNotNull)
      .withColumn("rn", row_number().over(wT))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("transition"))))
      .groupBy(col("transition"))
      .agg(count(lit(1)).as("n_users"),
        min(col("delta_s")).as("min_s"),
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("delta_s")))
          .as("median_s"),
        max(col("delta_s")).as("max_s"))
      .orderBy(col("transition"))
  }

  /** SESSIONIZED funnel — [[funnel]] asks "did the user EVER convert";
    * this asks "did they convert WITHIN ONE VISIT": events are tagged
    * with a gap-based session id (17-minute gap, the session family's
    * constant, compared in exact epoch micros), then the same chained
    * window minimums run per (user, session) and count SESSIONS
    * reaching each step. Two window stages over one user_id shuffle
    * (session tagging needs the ordered window, the funnel the
    * per-session one — same key prefix, no second exchange of the
    * events).
    */
  def sessionFunnel(s: SparkSession, d: String): DataFrame =
    sessionFunnelOn(ev(s, d))

  private[graft] def sessionFunnelOn(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tagged = events
      .withColumn("prev", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) >
            1020L * 1000000L, 1L).otherwise(0L))
      .withColumn("sid",
        sum(col("new_sess")).over(wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val wSess = Window.partitionBy(col("user_id"), col("sid"))
    val steps = FunnelSteps
    val ts = steps.indices.map(i => s"t${i + 1}")
    val labels = steps.zipWithIndex.map { case (st, i) => s"${i + 1}_$st" }
    val withT = steps.zipWithIndex.foldLeft(tagged) { case (df, (st, i)) =>
      val gate = col("event_type") === st &&
        (if (i == 0) lit(true) else col("ts") > col(ts(i - 1)))
      df.withColumn(ts(i), min(when(gate, col("ts"))).over(wSess))
    }
    withT
      .groupBy(col("user_id"), col("sid"))
      .agg(max(col(ts.head)).as(ts.head),
        ts.tail.map(t => max(col(t)).as(t)): _*)
      .agg(count(col(ts.head)).as(labels.head),
        ts.tail.zip(labels.tail)
          .map { case (t, l) => count(col(t)).as(l) }: _*)
      .unpivot(Array.empty, "step", "n_sessions")
      .orderBy(col("step"))
  }

  /** Weekly cohort retention: cohort = week index of a user's FIRST
    * event (integer days since 2024-01-01, DIV 7), activity offset =
    * whole weeks between the cohort day and each active day. Distinct
    * users per (cohort_week, week_offset) — the classic retention
    * triangle, all-integer so both engines replay it exactly.
    */
  def cohortRetention(s: SparkSession, d: String): DataFrame =
    cohortRetentionOn(ev(s, d))

  private[graft] def cohortRetentionOn(events: DataFrame,
      epoch: String = "2024-01-01"): DataFrame = {
    val e = events
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit(epoch).cast("date"))
          .as("day"))
    val first = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    e.join(first, Seq("user_id"))
      .select(col("user_id"), expr("cohort_day DIV 7").as("cohort_week"),
        expr("(day - cohort_day) DIV 7").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Per-user next-event transition matrix: lead() over (ts, event_id)
    * — event_id breaks timestamp ties deterministically — grouped into
    * (from, to) counts; a user's last event transitions to '(end)'. The
    * Markov-chain view of user behavior in one window + one aggregate.
    */
  def transitions(s: SparkSession, d: String): DataFrame =
    transitionsOn(ev(s, d))

  private[graft] def transitionsOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("next_type",
        coalesce(lead(col("event_type"), 1).over(w), lit("(end)")))
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("next_type"))
  }

  /** SEQUENCE ENTROPY RATE — how PREDICTABLE user journeys are, the
    * information-theoretic companion to [[transitions]]: per from-state
    * the conditional next-event entropy H(next | from) in nats, plus
    * each state's contribution (empirical from-state share × H) whose
    * sum over rows is the first-order entropy rate of the behavior
    * process. Low entropy ⇒ journeys are rule-like (prefetchable,
    * cacheable, funnel-shaped); a high-entropy state is where the
    * product loses the narrative. Last events per user drop (no '(end)'
    * state — the [[markovStationary]] chain convention).
    *
    * Exactness: the only transcendental is ln(n_ft / tot_f) — computed
    * once per matrix CELL over one double ratio of exact BIGINTs and
    * micro-quantized BEFORE the count-weighted sum (the
    * [[AggOps.mutualInfoOn]] idiom), so per-state sums are exact
    * integers and the two final divisions are mirrored chains. Engine
    * shape: one user-partitioned window pass → |types|² cells;
    * everything after is dimension-sized.
    */
  def sequenceEntropy(s: SparkSession, d: String): DataFrame =
    sequenceEntropyOn(ev(s, d))

  private[graft] def sequenceEntropyOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // two consumers: per-from totals + cells
    val fromTot = pairs.groupBy(col("event_type"))
      .agg(sum(col("n")).as("tot"), count(lit(1)).as("n_next"))
    val tAll = pairs.agg(sum(col("n")).as("t_all"))
    pairs.join(fromTot, Seq("event_type"))
      .withColumn("qln",
        floor(log(col("n").cast("double") / col("tot").cast("double"))
          * 1e6).cast("long"))
      .groupBy(col("event_type"), col("tot"), col("n_next"))
      .agg(sum(col("n") * col("qln")).as("wsum"))
      .crossJoin(broadcast(tAll)) // 1-row grand total
      .selectExpr("event_type", "tot AS n_trans", "n_next",
        "-(CAST(wsum AS DOUBLE) / CAST(tot AS DOUBLE)) / 1000000" +
          " AS h_cond_nats",
        "-(CAST(wsum AS DOUBLE) / CAST(t_all AS DOUBLE)) / 1000000" +
          " AS contrib_nats")
      .orderBy(col("event_type"))
  }

  /** STATIONARY DISTRIBUTION of the user-behavior Markov chain — where
    * the [[transitions]] matrix says user attention settles if the
    * observed dynamics keep running (THE summary a growth team reads off
    * a transition matrix: which state accumulates long-run mass). States
    * are event types; P(i→j) is estimated from per-user consecutive
    * pairs (last events drop — no '(end)' state, the chain is over
    * observed behavior only) and the uniform start vector is pushed
    * through 4 power-iteration rounds.
    *
    * Fixed-point arithmetic, the [[GraphOps.pageRank]] discipline: mass
    * is BIGINT micro-units, each from-state contributes
    * `units·cnt DIV tot` to its successors — all integral ops on
    * positive values, so the DuckDB oracle replays every round exactly
    * (a float chain would diverge on summation order). Floors leak mass
    * down by ≤ |states| units/round, identically in both engines.
    *
    * Scale shape: ONE user-partitioned window over raw events builds the
    * pair counts; everything after runs on the |types|² transition
    * matrix — driver-bounded like the funnel grid, so 4 rounds cost 4
    * joins over a dimension-sized frame (broadcast at any scale).
    * Headroom: units·cnt < 2⁶³ holds while Σunits·max_cnt ≲ 9·10¹⁸ —
    * beyond ~10¹² observed transitions per cell, lift the product into
    * decimal(38,0) (same note as PageRank's 85·Σcontrib).
    */
  def markovStationary(s: SparkSession, d: String): DataFrame =
    markovStationaryOn(ev(s, d), rounds = 4)

  /** The power-iteration fold over ONE collected |types|² transition
    * matrix (r20): round state starts at 10⁶ units per from-state and
    * each round pushes `units·cnt DIV tot` along every cell, re-keyed by
    * `to` — the same integral ops in the same per-cell order-free sums
    * as the chained join+aggregate rounds this replaces (long multiply /
    * integer divide semantics are identical in Scala and non-ANSI Spark
    * for these positive values), so the output is bit-identical while
    * the per-round driver job dispatch disappears. The matrix is
    * dimension-bounded (|types|²) at any corpus scale — the same
    * argument that lets the funnel grid collect.
    */
  private val markovPowerLocal = udf(
    (cells: Seq[Row], rounds: Int) => {
      val m = cells.map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      var units: Map[String, Long] =
        m.map(_._1).distinct.map(_ -> 1000000L).toMap
      (1 to rounds).foreach { _ =>
        val next = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        m.foreach { case (from, to, cnt, tot) =>
          units.get(from).foreach { u =>
            next(to) = next.getOrElse(to, 0L) + (u * cnt) / tot
          }
        }
        units = next.toMap
      }
      units.toSeq
    })

  private[graft] def markovStationaryOn(events: DataFrame,
      rounds: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from"), col("next_type").as("to"))
      .agg(count(lit(1)).as("cnt"))
    val tot = trans.groupBy(col("from")).agg(sum(col("cnt")).as("tot"))
    // ONE collect of the |types|² matrix, all rounds in a local fold
    trans.join(tot, Seq("from"))
      .agg(collect_list(struct(col("from"), col("to"), col("cnt"),
        col("tot"))).as("m"))
      .select(explode(markovPowerLocal(col("m"), lit(rounds))).as("o"))
      .select(col("o._1").as("event_type"), col("o._2").as("stat_units"))
      .orderBy(desc("stat_units"), col("event_type"))
  }

  /** EXPECTED STEPS TO SESSION END per starting state — the absorption
    * analysis that completes the [[markovStationary]] pair: with
    * '(end)' as the absorbing state (each user's last event transitions
    * to it), how many more events does a user emit on average from each
    * state? t = 1 + P·t restricted to live states, iterated `rounds`
    * times from 0 — the bounded partial sum Σ_{k≤rounds} P_live^k, the
    * same honest bounded-round contract as PageRank (absorption
    * probability per step is high here, so 8 rounds sit within
    * micro-units of the fixpoint). Integer micro-unit mass pushes
    * (`cnt·t DIV tot`), exact in both engines.
    *
    * Scale shape: identical to [[markovStationary]] — one user window
    * for pair counts, then `rounds` joins over the |types|²
    * dimension-sized matrix.
    */
  def markovAbsorption(s: SparkSession, d: String): DataFrame =
    markovAbsorptionOn(ev(s, d), rounds = 8)

  /** The absorption fold over the collected matrix (r20, the
    * [[markovPowerLocal]] discipline): t ← 1 + P_live·t from 0, `rounds`
    * times — live cells are the non-'(end)' transitions, states are ALL
    * from-states (a state whose every exit absorbs still scores 10⁶).
    * Same integral per-cell pushes and order-free sums as the chained
    * join rounds this replaces; bit-identical output, ~16 fewer jobs.
    */
  private val markovAbsorbLocal = udf(
    (cells: Seq[Row], rounds: Int) => {
      val m = cells.map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val states = m.map(_._1).distinct
      val live = m.filter(_._2 != "(end)")
      var units: Map[String, Long] = states.map(_ -> 0L).toMap
      (1 to rounds).foreach { _ =>
        val pushed = scala.collection.mutable.HashMap.empty[String, Long]
        live.foreach { case (from, to, cnt, tot) =>
          units.get(to).foreach { u =>
            pushed(from) = pushed.getOrElse(from, 0L) + (cnt * u) / tot
          }
        }
        units = states.map(s => s -> (1000000L + pushed.getOrElse(s, 0L)))
          .toMap
      }
      units.toSeq
    })

  private[graft] def markovAbsorptionOn(events: DataFrame,
      rounds: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events
      .withColumn("next_type",
        coalesce(lead(col("event_type"), 1).over(w), lit("(end)")))
      .groupBy(col("event_type").as("from"), col("next_type").as("to"))
      .agg(count(lit(1)).as("cnt"))
    val tot = trans.groupBy(col("from")).agg(sum(col("cnt")).as("tot"))
    trans.join(tot, Seq("from"))
      .agg(collect_list(struct(col("from"), col("to"), col("cnt"),
        col("tot"))).as("m"))
      .select(explode(markovAbsorbLocal(col("m"), lit(rounds))).as("o"))
      .select(col("o._1").as("event_type"),
        col("o._2").as("exp_steps_units"))
      .orderBy(desc("exp_steps_units"), col("event_type"))
  }

  /** TIME-DECAYED ENGAGEMENT SCORE per event type — the freshness-
    * weighted counter every ranking/trending feature store keeps: each
    * event's value contributes halved for every `halfLifeDays`-day step
    * of age (age measured against the newest event in the frame, so the
    * score is a pure function of the data — no wall clock in an
    * oracle-checked query).
    *
    * Exactness: value quantizes to integer milli-units, the decay is
    * an ARITHMETIC RIGHT SHIFT `(vu·1000) >> steps` capped at 62 —
    * shiftright floors for BOTH signs (≡ DuckDB's floor-dividing `//`
    * by 2^steps), so negative event values are first-class and both
    * engines agree bit-for-bit with no value-sign contract. Mass beyond
    * ~40 half-lives floors to zero — deliberately: that is what a decay
    * counter is FOR.
    *
    * Scale shape: one broadcast 1-row max, one narrow per-row
    * projection, one bounded groupBy — linear, no window, no shuffle
    * beyond the |types|-sized aggregate.
    */
  def decayScore(s: SparkSession, d: String): DataFrame =
    decayScoreOn(ev(s, d), halfLifeDays = 7)

  private[graft] def decayScoreOn(events: DataFrame,
      halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1: $halfLifeDays")
    val ref = events.agg(max(col("ts")).as("ref"))
    events.crossJoin(broadcast(ref))
      .withColumn("hl", expr("(unix_micros(ref) - unix_micros(ts)) DIV " +
        s"${86400000000L * halfLifeDays}"))
      .withColumn("vu", floor(col("value") * 1000).cast("long"))
      .withColumn("du",
        expr("shiftright(vu * 1000, CAST(least(hl, 62) AS INT))"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("vu")).as("raw_units"),
        sum(col("du")).as("decay_units"))
      .orderBy(desc("decay_units"), col("event_type"))
  }

  /** SEASONALITY GRID — event volume by (ISO day-of-week, hour-of-day)
    * with exact per-mille shares: the load-shape read capacity planning
    * and anomaly baselining start from (a CUSUM/EWMA alarm during the
    * Monday-9am peak means something different than at 3am Sunday).
    * Day-of-week alignment is the cross-engine trap: Spark's dayofweek
    * is Sunday=1 while DuckDB's is Sunday=0 — both sides therefore use
    * the ISO convention (Mon=1..Sun=7; Spark `weekday(ts)+1`, DuckDB
    * `isodow`). One map-side-partial aggregate to a ≤168-row grid.
    */
  def seasonality(s: SparkSession, d: String): DataFrame =
    seasonalityOn(ev(s, d))

  private[graft] def seasonalityOn(events: DataFrame): DataFrame = {
    val grid = events
      .groupBy(expr("weekday(ts) + 1").as("isodow"),
        hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // tiny grid: share denominator + output
    grid.crossJoin(broadcast(grid.agg(sum(col("n")).as("t"))))
      .select(col("isodow"), col("hod"), col("n"),
        expr("(n * 1000) DIV t").as("share_permille"))
      .orderBy(col("isodow"), col("hod"))
  }

  /** USER LIFETIME SURVIVAL CURVE — the retention read one level above
    * the cohort triangle: S(t) = share of users still active t days
    * after their first event, evaluated at every OBSERVED lifetime
    * (lifetime = whole days between a user's first and last event; the
    * Kaplan–Meier-style step curve without censoring, since the fixture
    * window closes). All integral: day floors, exact counts, per-mille
    * floor division.
    *
    * Scale shape: one user-keyed min/max aggregate compresses events to
    * a per-user lifetime, then everything runs on the lifetime
    * HISTOGRAM — bounded by the number of distinct whole-day lifetimes
    * (the data's calendar span, ~10³ rows per decade), so the ≥-join
    * that builds the tail-cumulative is a bounded broadcast theta join,
    * never a window over an unpartitioned sort.
    */
  def survival(s: SparkSession, d: String): DataFrame =
    survivalOn(ev(s, d))

  private[graft] def survivalOn(events: DataFrame): DataFrame = {
    val lt = events.groupBy(col("user_id"))
      .agg(expr("(unix_micros(max(ts)) - unix_micros(min(ts)))" +
        " DIV 86400000000").as("lt"))
    val byLt = lt.groupBy(col("lt")).agg(count(lit(1)).as("n"))
      .localCheckpoint() // tiny histogram, three consumers
    val tot = byLt.agg(sum(col("n")).as("t"))
    byLt.select(col("lt").as("lifetime_days"))
      .join(broadcast(byLt.select(col("lt").as("l2"), col("n"))),
        col("l2") >= col("lifetime_days"))
      .groupBy(col("lifetime_days"))
      .agg(sum(col("n")).as("n_users_at_least"))
      .crossJoin(broadcast(tot))
      .select(col("lifetime_days"), col("n_users_at_least"),
        expr("(n_users_at_least * 1000) DIV t").as("survival_permille"))
      .orderBy(col("lifetime_days"))
  }

  /** DAU/MAU STICKINESS per calendar month — the engagement ratio every
    * growth dashboard tracks (what share of a month's users show up on an
    * average day). Kept INTEGRAL end-to-end: per-month day count, summed
    * daily-active counts and monthly-active count are exact longs, and
    * stickiness reports as (1000·Σdau) DIV (n_days·mau) per-mille —
    * integer floor division, no float to drift. avg(DAU)/MAU ≡
    * Σdau/(n_days·mau), so the per-mille is the standard metric scaled.
    *
    * Scale shape: one distinct over (day, user) — the only pass touching
    * raw events, map-side partial-deduped — then two bounded aggregates;
    * the deduped frame feeds BOTH (two-consumers rule ⇒ materialize).
    * Calendar keys derive from the shared UTC session clock, so both
    * engines bucket identically.
    */
  def stickiness(s: SparkSession, d: String): DataFrame =
    stickinessOn(ev(s, d))

  private[graft] def stickinessOn(events: DataFrame): DataFrame = {
    val du = events
      .select(date_format(col("ts"), "yyyy-MM").as("month"),
        to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .localCheckpoint()
    val dau = du.groupBy(col("month"), col("day"))
      .agg(count(lit(1)).as("dau"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
    val mau = du.select(col("month"), col("user_id")).distinct()
      .groupBy(col("month")).agg(count(lit(1)).as("mau"))
    dau.join(mau, Seq("month"))
      .select(col("month"), col("n_days"), col("sum_dau"), col("mau"),
        expr("(1000 * sum_dau) DIV (n_days * mau)").as("stickiness_permille"))
      .orderBy(col("month"))
  }

  private[graft] val PathSteps = 5

  /** TOP USER JOURNEYS: the 20 most common opening event-type paths
    * (each user's first ≤ [[PathSteps]] events in (ts, event_id) order,
    * joined " > ") with how many users walk each — the full-sequence
    * refinement of [[transitions]]' one-step Markov view, the query
    * behind every "top paths" product-analytics panel (Sankey feeds).
    *
    * ONE user_id shuffle: the per-user prefix is a row_number that
    * Catalyst caps in-exchange via WindowGroupLimit (never buffers a
    * hot user's full history), the path string assembles from an
    * array_sort over (rn, type) structs — collect_list order is
    * partition-nondeterministic, the sort makes it a pure function of
    * the data — and the path-count aggregate + top-20 ride map-side
    * partials and TakeOrderedAndProject. Path cardinality is bounded by
    * |event types|^steps, not by users.
    */
  def pathsTopk(s: SparkSession, d: String): DataFrame =
    pathsTopkOn(ev(s, d), PathSteps)

  private[graft] def pathsTopkOn(events: DataFrame, steps: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= steps)
      .groupBy(col("user_id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), " > ").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), col("path"))
      .limit(20)
  }

  /** SCD-Type-2 snapshot build from the raw change log: each user's
    * events become half-open validity intervals [valid_from, valid_to)
    * via one lead() over (ts, event_id), the open-ended last row flagged
    * current — the warehouse dimension-table construction (CDC compaction)
    * in one window pass, no self-join. */
  def scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("event_id"))
    ev(s, d)
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("event_id"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  /** LAST-TOUCH ATTRIBUTION — the revenue-credit query every marketing
    * pipeline runs: each purchase credits the campaign (props.k) of the
    * user's most recent click at-or-before it (same-instant clicks
    * count; ties among clicks → highest event_id via the window order),
    * then revenue rolls up per campaign. The [[JoinOps.asofJoin]]
    * union+window idiom — ONE user_id shuffle, one in-partition sort,
    * never a click×purchase product — followed by a bounded
    * (campaign-count-sized) aggregate with the decimal-exact revenue
    * sum. Unattributed purchases (no prior click) are excluded, the
    * standard last-touch convention.
    */
  def attribution(s: SparkSession, d: String): DataFrame =
    attributionOn(s, d, firstTouch = false)

  /** FIRST-touch variant: the purchase credits the EARLIEST click in the
    * user's history instead of the latest — same single window pass
    * (first instead of last over the identical frame), so comparing the
    * two rollups quantifies how much credit moves from closers to
    * openers.
    */
  def attributionFirst(s: SparkSession, d: String): DataFrame =
    attributionOn(s, d, firstTouch = true)

  /** LINEAR (multi-touch) attribution — the third standard model: each
    * purchase splits its revenue EQUALLY across the distinct campaigns
    * of its last ≤5 prior clicks. Credit is integral: floor(value·10⁴)
    * micro-cents DIV the distinct-campaign count (value ≥ 0 in this
    * domain, so DIV = floor on both engines — the same positivity
    * argument as [[timeToConvertOn]]'s deltas), then summed as longs —
    * order-independent where a fractional double split would
    * ulp-diverge under Spark's nondeterministic partial-sum order.
    * Same single user_id window as the single-touch models; the touch
    * list is ≤5 elements per purchase by construction, so the explode
    * is bounded.
    */
  def attributionLinear(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"),
        when(col("event_type") === "click",
          get_json_object(col("props"), "$.k").cast("long")).as("campaign"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(col("campaign").isNull, 1).otherwise(0), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("touches", collect_list(col("campaign")).over(w))
      .filter(col("event_type") === "purchase" && size(col("touches")) > 0)
      .withColumn("cset", array_distinct(
        expr("slice(touches, greatest(size(touches) - 4, 1), 5)")))
      .withColumn("credit_units",
        expr("CAST(floor(value * 1e4) AS BIGINT) DIV size(cset)"))
      .select(explode(col("cset")).as("campaign"), col("credit_units"))
      .groupBy(col("campaign"))
      .agg(count(lit(1)).as("n_creditings"),
        sum(col("credit_units")).as("credit_units"))
      .orderBy(col("campaign"))
  }

  /** POSITION-BASED (U-shaped) attribution — the fourth standard model:
    * over the same last-≤5-touch window as [[attributionLinear]], the
    * FIRST and LAST touch each take 40% of the purchase credit and the
    * middle touches split the remaining 20% equally (1 touch → 100%,
    * 2 touches → 50/50). Credit stays integral — micro-cent units with
    * ((units·4) DIV 10)-style shares, every divisor positive so DIV =
    * floor on both engines — and campaigns are credited PER TOUCH (a
    * campaign occupying both endpoints earns both 40% shares), the
    * standard U-shape convention. Same single user_id window + bounded
    * posexplode as the linear model.
    */
  def attributionPosition(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"),
        when(col("event_type") === "click",
          get_json_object(col("props"), "$.k").cast("long")).as("campaign"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(col("campaign").isNull, 1).otherwise(0), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("touches", collect_list(col("campaign")).over(w))
      .filter(col("event_type") === "purchase" && size(col("touches")) > 0)
      .withColumn("tl",
        expr("slice(touches, greatest(size(touches) - 4, 1), 5)"))
      .withColumn("units", expr("CAST(floor(value * 1e4) AS BIGINT)"))
      .withColumn("n", size(col("tl")))
      .selectExpr("posexplode(tl) AS (pos, campaign)", "units", "n")
      .withColumn("credit_units", expr(
        """CASE WHEN n = 1 THEN units
                WHEN n = 2 THEN units DIV 2
                WHEN pos = 0 OR pos = n - 1 THEN (units * 4) DIV 10
                ELSE ((units * 2) DIV 10) DIV (n - 2) END"""))
      .groupBy(col("campaign"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_units")).as("credit_units"))
      .orderBy(col("campaign"))
  }

  /** TIME-DECAY attribution — the fifth standard model: every touch in
    * the last-≤5 window earns credit proportional to 2^(−age/halflife)
    * with a 7-day half-life. Weights are integral powers of two
    * (w = 2^(7 − min(age_days DIV 7, 7)) ∈ {1..128}; age_days is an
    * epoch-micro difference DIV 86400·10⁶, non-negative because touches
    * precede the purchase in the window order), and each touch's credit
    * is (units·w) DIV Σw — an integer proportional split both engines
    * replay exactly, where the float softmax-style normalization would
    * ulp-diverge. Touch timestamps ride along in the collected struct;
    * everything else is the same bounded single-window shape.
    */
  def attributionDecay(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"),
        when(col("event_type") === "click",
          get_json_object(col("props"), "$.k").cast("long")).as("campaign"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(col("campaign").isNull, 1).otherwise(0), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("touches", collect_list(
        when(col("campaign").isNotNull,
          struct(col("campaign"), unix_micros(col("ts")).as("tus")))).over(w))
      .filter(col("event_type") === "purchase" && size(col("touches")) > 0)
      .withColumn("tl",
        expr("slice(touches, greatest(size(touches) - 4, 1), 5)"))
      .withColumn("units", expr("CAST(floor(value * 1e4) AS BIGINT)"))
      .withColumn("pus", unix_micros(col("ts")))
      .withColumn("wl", expr(
        """transform(tl, t ->
             shiftleft(1L, 7 - CAST(least((pus - t.tus) DIV 86400000000,
                                          7) AS INT)))"""))
      .withColumn("wsum", expr(
        "aggregate(wl, 0L, (acc, x) -> acc + x)"))
      .selectExpr("posexplode(tl) AS (pos, t)", "wl", "units", "wsum")
      .withColumn("credit_units",
        expr("(units * wl[pos]) DIV wsum"))
      .groupBy(col("t.campaign").as("campaign"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_units")).as("credit_units"))
      .orderBy(col("campaign"))
  }

  /** RFM SEGMENTATION — the classic customer-value grid: per buying
    * user, Recency (whole days from their last purchase to the stream's
    * anchor = global max event time), Frequency (purchase count) and
    * Monetary (micro-cent revenue sum), each scored into quartiles, then
    * the 4×4×4 segment grid rolled up. Scores are ascending quartile
    * indexes (1 = lowest metric; the marketing convention's reversed R
    * is a relabel) assigned by [[WindowOps.ntileBucket]] — exact-rank
    * arithmetic over a range partitioning, bit-identical to
    * `ntile(4) OVER (ORDER BY metric, user_id)` without the SQL
    * function's single-task global sort, so the scoring is the same
    * plan shape at 10⁹ users as at 10³. All-integer metrics (day DIVs,
    * counts, micro-cents) make every quartile boundary engine-exact.
    */
  def rfm(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val anchor = e.agg(max(unix_micros(col("ts"))).as("aus"))
    val per = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("frequency"),
        sum(expr("CAST(floor(value * 1e4) AS BIGINT)"))
          .as("monetary_units"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days", expr("(aus - last_us) DIV 86400000000"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_units"))
    val scored = Seq(
      (col("recency_days"), "r_score"),
      (col("frequency"), "f_score"),
      (col("monetary_units"), "m_score"))
      .foldLeft(per) { case (df, (metric, out)) =>
        WindowOps.ntileBucket(df, Seq(metric, col("user_id")), 4L, out)
      }
    scored
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("monetary_units")).as("monetary_units"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  private def attributionOn(s: SparkSession, d: String,
      firstTouch: Boolean): DataFrame = {
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"),
        when(col("event_type") === "click",
          get_json_object(col("props"), "$.k").cast("long")).as("campaign"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(col("campaign").isNull, 1).otherwise(0), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attr =
      if (firstTouch) first(col("campaign"), ignoreNulls = true).over(w)
      else last(col("campaign"), ignoreNulls = true).over(w)
    e.withColumn("attr", attr)
      .filter(col("event_type") === "purchase" && col("attr").isNotNull)
      .groupBy(col("attr").as("campaign"))
      .agg(count(lit(1)).as("n_purchases"),
        graft.functions.Num.dsum(col("value")).as("revenue"))
      .orderBy(col("campaign"))
  }

  /** BURSTINESS (Goh–Barabási 2008) of each event type's per-user
    * inter-arrival process: B = (σ−μ)/(σ+μ) over the gap distribution —
    * B = −1 for a perfectly periodic stream, ≈ 0 for Poisson, → 1 for
    * heavy-tailed bursts. The operational read: bursty types need
    * admission buffering sized to peaks, periodic ones to the mean.
    * Gaps are per (user, type) lag deltas in MINUTES (bounds every
    * moment: gap ≤ ~10⁵ for a quarter of data, Σgap² fits BIGINT) from
    * ONE partitioned window; per-type moments in one aggregate; σ, μ
    * and B are double expressions over bit-equal integer moments with
    * the n·Σg² product cast to DOUBLE before multiplying (the ev_trend
    * overflow rule). Zero-variance streams read B = −1 (periodic); the
    * all-gaps-zero degenerate (σ = μ = 0) emits NULL rather than 0/0.
    */
  def burstinessByType(s: SparkSession, d: String): DataFrame =
    burstinessOn(ev(s, d), "event_type", "user_id", "ts", "event_id")

  /** Generic core: gaps within (grpCol, subjCol), moments per grpCol. */
  private[graft] def burstinessOn(df: DataFrame, grpCol: String,
      subjCol: String, tsCol: String, idCol: String): DataFrame = {
    df.select(col(grpCol).as("event_type"), col(subjCol).as("subj"),
        col(tsCol).as("ts"), col(idCol).as("tid"))
      .withColumn("gap",
        expr("(unix_micros(ts) - unix_micros(lag(ts) OVER " +
          "(PARTITION BY subj, event_type ORDER BY ts, tid)))" +
          " DIV 60000000"))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap")).as("sg"),
        sum(col("gap") * col("gap")).as("sgg"))
      .withColumn("varn", expr( // n²·Var = n·Σg² − (Σg)², in doubles
        """CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
           - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)"""))
      .selectExpr(s"event_type AS `$grpCol`", "n_gaps",
        "CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_min",
        """CASE WHEN varn <= 0 AND sg = 0 THEN NULL
                WHEN varn < 0 THEN NULL
           ELSE (sqrt(varn) - CAST(sg AS DOUBLE))
                / (sqrt(varn) + CAST(sg AS DOUBLE)) END AS burstiness""")
      .orderBy(col(grpCol))
  }

  /** PER-GROUP OLS TREND — the "is this metric drifting" readout: least-
    * squares slope of value vs event time within each event_type, in
    * value-units per day. The whole regression is FOUR integer moments
    * per group (n, Σt, Σv, Σt², Σtv) from one aggregation pass — the
    * textbook one-MR-job regression; no sort, no window, no iteration.
    * Exactness bounds picked so every moment fits BIGINT at 100 TB-ish
    * group sizes: t is MINUTES since the group's first event (re-based
    * via a broadcast min join — t ≤ ~10⁵ for a quarter of data, so
    * Σt² ≤ 10¹⁵ per 10⁵ rows), v is milli-units. The slope is then one
    * double expression over bit-equal integer moments — identical IEEE
    * chain in both engines. Groups need ≥ 2 distinct minutes (else the
    * denominator is 0 and the slope NULL — kept, not crashed).
    */
  def trendByType(s: SparkSession, d: String): DataFrame =
    trendOn(ev(s, d), "event_type", "ts", "value")

  private[graft] def trendOn(df: DataFrame, grpCol: String,
      tsCol: String, valCol: String): DataFrame = {
    val base = df.select(col(grpCol).as("event_type"),
      col(tsCol).as("ts"), floor(col(valCol) * 1000).cast("long").as("vu"))
    val t0 = base.groupBy(col("event_type"))
      .agg(min(col("ts")).as("ts0"))
    base.join(broadcast(t0), Seq("event_type"))
      .withColumn("t",
        expr("(unix_micros(ts) - unix_micros(ts0)) DIV 60000000"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("t")).as("st"), sum(col("vu")).as("sv"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("vu")).as("stv"))
      // cast BEFORE multiplying: st·sv can pass 2⁶³; the double chain
      // over bit-equal integer moments is identical in both engines.
      // The CASE guards one-minute groups (denominator 0 → NULL slope;
      // ANSI Spark would otherwise throw DIVIDE_BY_ZERO).
      .withColumn("numer", expr(
        """CAST(n_events AS DOUBLE) * CAST(stv AS DOUBLE)
           - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE)"""))
      .withColumn("denom", expr(
        """CAST(n_events AS DOUBLE) * CAST(stt AS DOUBLE)
           - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)"""))
      .selectExpr(s"event_type AS `$grpCol`", "n_events",
        """CASE WHEN denom = 0 THEN NULL
           ELSE numer / denom * 1440 / 1000 END AS slope_per_day""",
        "CAST(sv AS DOUBLE) / CAST(n_events AS DOUBLE) / 1000 AS mean_v")
      .orderBy(col(grpCol))
  }

  val queries = Map(
    "ev_trend" -> (trendByType _),
    "ev_burstiness" -> (burstinessByType _),
    "ev_attribution" -> (attribution _),
    "ev_attribution_first" -> (attributionFirst _),
    "ev_attribution_linear" -> (attributionLinear _),
    "ev_attribution_position" -> (attributionPosition _),
    "ev_attribution_decay" -> (attributionDecay _),
    "ev_funnel" -> (funnel _),
    "ev_funnel_72h" -> (funnelWindowed _),
    "ev_time_to_convert" -> (timeToConvert _),
    "ev_session_funnel" -> (sessionFunnel _),
    "ev_scd2" -> (scd2 _),
    "ev_rfm" -> (rfm _),
    "ev_cohort_retention" -> (cohortRetention _),
    "ev_paths_topk" -> (pathsTopk _),
    "ev_stickiness" -> (stickiness _),
    "ev_transitions" -> (transitions _),
    "ev_sequence_entropy" -> (sequenceEntropy _),
    "ev_markov_stationary" -> (markovStationary _),
    "ev_markov_absorption" -> (markovAbsorption _),
    "ev_decay_score" -> (decayScore _),
    "ev_survival" -> (survival _),
    "ev_seasonality" -> (seasonality _))

  /** one unrolled absorption round: tₖ = 1e6 + P_live·tₖ₋₁ in units. */
  private def mabIter(k: Int): String =
    s"""t$k AS (SELECT st.state,
         CAST(1000000 AS BIGINT) + coalesce(p.pushed, 0) AS units
       FROM st LEFT JOIN (
         SELECT wd.f, CAST(sum((wd.cnt * t.units) // wd.tot) AS BIGINT)
           AS pushed
         FROM wd JOIN t${k - 1} t ON wd.t = t.state GROUP BY wd.f) p
         ON st.state = p.f)"""

  /** one unrolled stationary-distribution power round (integer units). */
  private def mkvIter(k: Int): String =
    s"""r$k AS (SELECT wd.t AS state,
         CAST(sum((r.units * wd.cnt) // wd.tot) AS BIGINT) AS units
       FROM wd JOIN r${k - 1} r ON wd.f = r.state GROUP BY wd.t)"""

  val oracle = Map(
    "ev_burstiness" ->
      """WITH g AS (SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP))
              - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                (PARTITION BY user_id, event_type
                 ORDER BY CAST(ts AS TIMESTAMP), event_id))
             // 60000000 AS gap
           FROM events),
         m AS (SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap) AS BIGINT) AS sg,
             CAST(sum(gap * gap) AS BIGINT) AS sgg
           FROM g WHERE gap IS NOT NULL GROUP BY event_type),
         v AS (SELECT event_type, n_gaps, sg,
             CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
             - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) AS varn
           FROM m)
         SELECT event_type, n_gaps,
           CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_min,
           CASE WHEN varn <= 0 AND sg = 0 THEN NULL
                WHEN varn < 0 THEN NULL
           ELSE (sqrt(varn) - CAST(sg AS DOUBLE))
                / (sqrt(varn) + CAST(sg AS DOUBLE)) END AS burstiness
         FROM v ORDER BY event_type""",
    "ev_trend" ->
      """WITH base AS (SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
             CAST(floor(value * 1000) AS BIGINT) AS vu
           FROM events),
         t0 AS (SELECT event_type, min(tus) AS t0 FROM base
           GROUP BY event_type),
         m AS (SELECT b.event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum((b.tus - t0.t0) // 60000000) AS BIGINT) AS st,
             CAST(sum(b.vu) AS BIGINT) AS sv,
             CAST(sum(((b.tus - t0.t0) // 60000000)
               * ((b.tus - t0.t0) // 60000000)) AS BIGINT) AS stt,
             CAST(sum(((b.tus - t0.t0) // 60000000) * b.vu) AS BIGINT)
               AS stv
           FROM base b JOIN t0 USING (event_type)
           GROUP BY b.event_type)
         SELECT event_type, n_events,
           CASE WHEN CAST(n_events AS DOUBLE) * CAST(stt AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) = 0
             THEN NULL
             ELSE (CAST(n_events AS DOUBLE) * CAST(stv AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
                  / (CAST(n_events AS DOUBLE) * CAST(stt AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                  * 1440 / 1000 END AS slope_per_day,
           CAST(sv AS DOUBLE) / CAST(n_events AS DOUBLE) / 1000 AS mean_v
         FROM m ORDER BY event_type""",
    "ev_attribution" ->
      """WITH ev AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             event_type, value,
             CASE WHEN event_type = 'click'
               THEN CAST(json_extract(props, '$.k') AS BIGINT) END
               AS campaign
           FROM events WHERE event_type IN ('click', 'purchase')),
         w AS (
           SELECT event_id, event_type, value,
             last_value(campaign IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY ts, CASE WHEN campaign IS NULL THEN 1 ELSE 0 END,
                 event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr
           FROM ev)
         SELECT attr AS campaign, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM w WHERE event_type = 'purchase' AND attr IS NOT NULL
         GROUP BY attr ORDER BY attr""",
    "ev_attribution_linear" ->
      """WITH ev AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             event_type, value,
             CASE WHEN event_type = 'click'
               THEN CAST(json_extract(props, '$.k') AS BIGINT) END
               AS campaign
           FROM events WHERE event_type IN ('click', 'purchase')),
         w AS (
           SELECT event_id, event_type, value,
             list_filter(list(campaign) OVER (PARTITION BY user_id
               ORDER BY ts, CASE WHEN campaign IS NULL THEN 1 ELSE 0 END,
                 event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               x -> x IS NOT NULL) AS touches
           FROM ev),
         p AS (
           SELECT event_id, value,
             list_distinct(
               touches[greatest(len(touches) - 4, 1):len(touches)]) AS cset
           FROM w WHERE event_type = 'purchase' AND len(touches) > 0),
         c AS (
           SELECT unnest(cset) AS campaign,
             CAST(floor(value * 1e4) AS BIGINT) // len(cset) AS credit_units
           FROM p)
         SELECT campaign, CAST(count(*) AS BIGINT) AS n_creditings,
           CAST(sum(credit_units) AS BIGINT) AS credit_units
         FROM c GROUP BY campaign ORDER BY campaign""",
    "ev_attribution_position" ->
      """WITH ev AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             event_type, value,
             CASE WHEN event_type = 'click'
               THEN CAST(json_extract(props, '$.k') AS BIGINT) END
               AS campaign
           FROM events WHERE event_type IN ('click', 'purchase')),
         w AS (
           SELECT event_id, event_type, value,
             list_filter(list(campaign) OVER (PARTITION BY user_id
               ORDER BY ts, CASE WHEN campaign IS NULL THEN 1 ELSE 0 END,
                 event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               x -> x IS NOT NULL) AS touches
           FROM ev),
         p AS (
           SELECT CAST(floor(value * 1e4) AS BIGINT) AS units,
             touches[greatest(len(touches) - 4, 1):len(touches)] AS tl
           FROM w WHERE event_type = 'purchase' AND len(touches) > 0),
         c AS (
           SELECT unnest(tl) AS campaign, unnest(range(len(tl))) AS pos,
             units, len(tl) AS n
           FROM p)
         SELECT campaign, CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(CASE WHEN n = 1 THEN units
             WHEN n = 2 THEN units // 2
             WHEN pos = 0 OR pos = n - 1 THEN (units * 4) // 10
             ELSE ((units * 2) // 10) // (n - 2) END) AS BIGINT)
             AS credit_units
         FROM c GROUP BY campaign ORDER BY campaign""",
    "ev_attribution_decay" ->
      """WITH ev AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             event_type, value,
             CASE WHEN event_type = 'click'
               THEN CAST(json_extract(props, '$.k') AS BIGINT) END
               AS campaign
           FROM events WHERE event_type IN ('click', 'purchase')),
         w AS (
           SELECT event_id, event_type, value, epoch_us(ts) AS pus,
             list_filter(list(CASE WHEN campaign IS NOT NULL THEN
                 struct_pack(campaign := campaign, tus := epoch_us(ts)) END)
               OVER (PARTITION BY user_id
                 ORDER BY ts, CASE WHEN campaign IS NULL THEN 1 ELSE 0 END,
                   event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               x -> x IS NOT NULL) AS touches
           FROM ev),
         p AS (
           SELECT CAST(floor(value * 1e4) AS BIGINT) AS units, pus,
             touches[greatest(len(touches) - 4, 1):len(touches)] AS tl
           FROM w WHERE event_type = 'purchase' AND len(touches) > 0),
         q AS (
           SELECT units, tl,
             list_transform(tl, t -> CAST(1 AS BIGINT) <<
               (7 - CAST(least((pus - t.tus) // 86400000000, 7) AS INT)))
               AS wl
           FROM p),
         c AS (
           SELECT unnest(tl) AS t, unnest(wl) AS tw, units,
             CAST(list_sum(wl) AS BIGINT) AS wsum
           FROM q)
         SELECT t.campaign AS campaign, CAST(count(*) AS BIGINT)
             AS n_touches,
           CAST(sum((units * tw) // wsum) AS BIGINT) AS credit_units
         FROM c GROUP BY t.campaign ORDER BY campaign""",
    "ev_attribution_first" ->
      """WITH ev AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             event_type, value,
             CASE WHEN event_type = 'click'
               THEN CAST(json_extract(props, '$.k') AS BIGINT) END
               AS campaign
           FROM events WHERE event_type IN ('click', 'purchase')),
         w AS (
           SELECT event_id, event_type, value,
             first_value(campaign IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY ts, CASE WHEN campaign IS NULL THEN 1 ELSE 0 END,
                 event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr
           FROM ev)
         SELECT attr AS campaign, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM w WHERE event_type = 'purchase' AND attr IS NOT NULL
         GROUP BY attr ORDER BY attr""",
    "ev_funnel_72h" ->
      """WITH e AS (SELECT user_id, event_type,
             CAST(ts AS TIMESTAMP) AS ts FROM events),
         t1 AS (SELECT user_id, min(ts) AS t1 FROM e
                WHERE event_type = 'signup' GROUP BY user_id),
         t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
                JOIN t1 ON e.user_id = t1.user_id
                WHERE e.event_type = 'view' AND e.ts > t1.t1
                  AND epoch_us(e.ts) - epoch_us(t1.t1) <= 259200000000
                GROUP BY e.user_id),
         t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
                JOIN t2 ON e.user_id = t2.user_id
                JOIN t1 ON e.user_id = t1.user_id
                WHERE e.event_type = 'click' AND e.ts > t2.t2
                  AND epoch_us(e.ts) - epoch_us(t1.t1) <= 259200000000
                GROUP BY e.user_id),
         t4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM e
                JOIN t3 ON e.user_id = t3.user_id
                JOIN t1 ON e.user_id = t1.user_id
                WHERE e.event_type = 'purchase' AND e.ts > t3.t3
                  AND epoch_us(e.ts) - epoch_us(t1.t1) <= 259200000000
                GROUP BY e.user_id)
         SELECT step, n_users FROM (
           SELECT '1_signup' AS step, CAST(count(*) AS BIGINT) AS n_users
             FROM t1
           UNION ALL SELECT '2_view', CAST(count(*) AS BIGINT) FROM t2
           UNION ALL SELECT '3_click', CAST(count(*) AS BIGINT) FROM t3
           UNION ALL SELECT '4_purchase', CAST(count(*) AS BIGINT) FROM t4)
         ORDER BY step""",
    "ev_time_to_convert" ->
      """WITH e AS (SELECT user_id, event_type,
             CAST(ts AS TIMESTAMP) AS ts FROM events),
         t1 AS (SELECT user_id, min(ts) AS t1 FROM e
                WHERE event_type = 'signup' GROUP BY user_id),
         t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
                JOIN t1 ON e.user_id = t1.user_id
                WHERE e.event_type = 'view' AND e.ts > t1.t1
                GROUP BY e.user_id),
         t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
                JOIN t2 ON e.user_id = t2.user_id
                WHERE e.event_type = 'click' AND e.ts > t2.t2
                GROUP BY e.user_id),
         t4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM e
                JOIN t3 ON e.user_id = t3.user_id
                WHERE e.event_type = 'purchase' AND e.ts > t3.t3
                GROUP BY e.user_id),
         d AS (
           SELECT '1_signup->2_view' AS transition,
             (epoch_us(t2.t2) - epoch_us(t1.t1)) // 1000000 AS delta_s
           FROM t1 JOIN t2 USING (user_id)
           UNION ALL
           SELECT '2_view->3_click',
             (epoch_us(t3.t3) - epoch_us(t2.t2)) // 1000000
           FROM t2 JOIN t3 USING (user_id)
           UNION ALL
           SELECT '3_click->4_purchase',
             (epoch_us(t4.t4) - epoch_us(t3.t3)) // 1000000
           FROM t3 JOIN t4 USING (user_id)),
         r AS (SELECT transition, delta_s,
             row_number() OVER (PARTITION BY transition
               ORDER BY delta_s) AS rn,
             count(*) OVER (PARTITION BY transition) AS n
           FROM d)
         SELECT transition, CAST(count(*) AS BIGINT) AS n_users,
           min(delta_s) AS min_s,
           max(CASE WHEN rn = (n + 1) // 2 THEN delta_s END) AS median_s,
           max(delta_s) AS max_s
         FROM r GROUP BY transition ORDER BY transition""",
    "ev_rfm" ->
      """WITH p AS (
           SELECT user_id,
             max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(floor(value * 1e4) AS BIGINT)) AS BIGINT)
               AS monetary_units
           FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         a AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS aus
               FROM events),
         s AS (SELECT user_id,
             (aus - last_us) // 86400000000 AS recency_days,
             frequency, monetary_units
           FROM p, a),
         t AS (SELECT user_id, monetary_units,
             ntile(4) OVER (ORDER BY recency_days, user_id) AS r_score,
             ntile(4) OVER (ORDER BY frequency, user_id) AS f_score,
             ntile(4) OVER (ORDER BY monetary_units, user_id) AS m_score
           FROM s)
         SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(monetary_units) AS BIGINT) AS monetary_units
         FROM t GROUP BY r_score, f_score, m_score
         ORDER BY r_score, f_score, m_score""",
    "ev_scd2" ->
      """SELECT user_id, event_type AS state,
           CAST(ts AS TIMESTAMP) AS valid_from, event_id,
           lead(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS valid_to,
           (lead(ts, 1) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) IS NULL) AS is_current
         FROM events ORDER BY user_id, valid_from, event_id""",
    "ev_session_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
             CAST(ts AS TIMESTAMP) AS ts FROM events),
         tagged AS (SELECT user_id, sid, event_type, ts FROM (
           SELECT user_id, event_type, ts,
             SUM(CASE WHEN prev IS NULL
                 OR epoch_us(ts) - epoch_us(prev) > 1020000000
               THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM (SELECT user_id, event_id, event_type, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev FROM e))),
         t1 AS (SELECT user_id, sid, min(ts) AS t1 FROM tagged
                WHERE event_type = 'signup' GROUP BY user_id, sid),
         t2 AS (SELECT g.user_id, g.sid, min(g.ts) AS t2 FROM tagged g
                JOIN t1 ON g.user_id = t1.user_id AND g.sid = t1.sid
                WHERE g.event_type = 'view' AND g.ts > t1.t1
                GROUP BY g.user_id, g.sid),
         t3 AS (SELECT g.user_id, g.sid, min(g.ts) AS t3 FROM tagged g
                JOIN t2 ON g.user_id = t2.user_id AND g.sid = t2.sid
                WHERE g.event_type = 'click' AND g.ts > t2.t2
                GROUP BY g.user_id, g.sid),
         t4 AS (SELECT g.user_id, g.sid, min(g.ts) AS t4 FROM tagged g
                JOIN t3 ON g.user_id = t3.user_id AND g.sid = t3.sid
                WHERE g.event_type = 'purchase' AND g.ts > t3.t3
                GROUP BY g.user_id, g.sid)
         SELECT step, n_sessions FROM (
           SELECT '1_signup' AS step, CAST(count(*) AS BIGINT) AS n_sessions
             FROM t1
           UNION ALL SELECT '2_view', CAST(count(*) AS BIGINT) FROM t2
           UNION ALL SELECT '3_click', CAST(count(*) AS BIGINT) FROM t3
           UNION ALL SELECT '4_purchase', CAST(count(*) AS BIGINT) FROM t4)
         ORDER BY step""",
    "ev_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
             CAST(ts AS TIMESTAMP) AS ts FROM events),
         t1 AS (SELECT user_id, min(ts) AS t1 FROM e
                WHERE event_type = 'signup' GROUP BY user_id),
         t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
                JOIN t1 ON e.user_id = t1.user_id
                WHERE e.event_type = 'view' AND e.ts > t1.t1
                GROUP BY e.user_id),
         t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
                JOIN t2 ON e.user_id = t2.user_id
                WHERE e.event_type = 'click' AND e.ts > t2.t2
                GROUP BY e.user_id),
         t4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM e
                JOIN t3 ON e.user_id = t3.user_id
                WHERE e.event_type = 'purchase' AND e.ts > t3.t3
                GROUP BY e.user_id)
         SELECT step, n_users FROM (
           SELECT '1_signup' AS step, CAST(count(*) AS BIGINT) AS n_users
             FROM t1
           UNION ALL SELECT '2_view', CAST(count(*) AS BIGINT) FROM t2
           UNION ALL SELECT '3_click', CAST(count(*) AS BIGINT) FROM t3
           UNION ALL SELECT '4_purchase', CAST(count(*) AS BIGINT) FROM t4)
         ORDER BY step""",
    "ev_cohort_retention" ->
      """WITH e AS (SELECT user_id,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '2024-01-01' AS day
           FROM events),
         first AS (SELECT user_id, min(day) AS cohort_day FROM e
                   GROUP BY user_id)
         SELECT cohort_day // 7 AS cohort_week,
           (day - cohort_day) // 7 AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM e JOIN first ON e.user_id = first.user_id
         GROUP BY cohort_week, week_offset
         ORDER BY cohort_week, week_offset""",
    "ev_transitions" ->
      """SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
         FROM (SELECT event_type,
             coalesce(lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id), '(end)') AS next_type
           FROM events)
         GROUP BY event_type, next_type
         ORDER BY event_type, next_type""",
    "ev_sequence_entropy" ->
      """WITH nx AS (SELECT event_type,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         pairs AS (SELECT event_type, next_type,
             CAST(count(*) AS BIGINT) AS n
           FROM nx WHERE next_type IS NOT NULL
           GROUP BY event_type, next_type),
         ft AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot,
             CAST(count(*) AS BIGINT) AS n_next
           FROM pairs GROUP BY event_type),
         ta AS (SELECT CAST(sum(n) AS BIGINT) AS t_all FROM pairs),
         q AS (SELECT p.event_type, ft.tot, ft.n_next,
             CAST(sum(p.n * CAST(floor(ln(CAST(p.n AS DOUBLE)
               / CAST(ft.tot AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT)
               AS wsum
           FROM pairs p JOIN ft ON p.event_type = ft.event_type
           GROUP BY p.event_type, ft.tot, ft.n_next)
         SELECT event_type, tot AS n_trans, n_next,
           -(CAST(wsum AS DOUBLE) / CAST(tot AS DOUBLE)) / 1000000
             AS h_cond_nats,
           -(CAST(wsum AS DOUBLE) / CAST(t_all AS DOUBLE)) / 1000000
             AS contrib_nats
         FROM q CROSS JOIN ta ORDER BY event_type""",
    "ev_markov_stationary" ->
      s"""WITH nx AS (SELECT event_type AS f,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS t
           FROM events),
         tr AS (SELECT f, t, CAST(count(*) AS BIGINT) AS cnt
           FROM nx WHERE t IS NOT NULL GROUP BY f, t),
         tot AS (SELECT f, CAST(sum(cnt) AS BIGINT) AS tot
           FROM tr GROUP BY f),
         wd AS (SELECT tr.f, tr.t, tr.cnt, tot.tot
           FROM tr JOIN tot ON tr.f = tot.f),
         r0 AS (SELECT DISTINCT f AS state, CAST(1000000 AS BIGINT) AS units
           FROM wd),
         ${(1 to 4).map(mkvIter).mkString(",\n         ")}
         SELECT state AS event_type, units AS stat_units FROM r4
         ORDER BY stat_units DESC, event_type""",
    "ev_markov_absorption" ->
      s"""WITH nx AS (SELECT event_type AS f,
             coalesce(lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id), '(end)') AS t
           FROM events),
         tr AS (SELECT f, t, CAST(count(*) AS BIGINT) AS cnt
           FROM nx GROUP BY f, t),
         tot AS (SELECT f, CAST(sum(cnt) AS BIGINT) AS tot
           FROM tr GROUP BY f),
         wd AS (SELECT tr.f, tr.t, tr.cnt, tot.tot
           FROM tr JOIN tot ON tr.f = tot.f WHERE tr.t <> '(end)'),
         st AS (SELECT f AS state FROM tot),
         t0 AS (SELECT state, CAST(0 AS BIGINT) AS units FROM st),
         ${(1 to 8).map(mabIter).mkString(",\n         ")}
         SELECT state AS event_type, units AS exp_steps_units FROM t8
         ORDER BY exp_steps_units DESC, event_type""",
    "ev_seasonality" ->
      """WITH g AS (SELECT isodow(CAST(ts AS TIMESTAMP)) AS isodow,
             hour(CAST(ts AS TIMESTAMP)) AS hod,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY isodow, hod),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM g)
         SELECT isodow, hod, n, (n * 1000) // t.t AS share_permille
         FROM g CROSS JOIN t ORDER BY isodow, hod""",
    "ev_survival" ->
      """WITH lt AS (SELECT user_id,
             (epoch_us(max(CAST(ts AS TIMESTAMP)))
               - epoch_us(min(CAST(ts AS TIMESTAMP)))) // 86400000000 AS lt
           FROM events GROUP BY user_id),
         b AS (SELECT lt, CAST(count(*) AS BIGINT) AS n
           FROM lt GROUP BY lt),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM b)
         SELECT a.lt AS lifetime_days,
           CAST(sum(b2.n) AS BIGINT) AS n_users_at_least,
           (CAST(sum(b2.n) AS BIGINT) * 1000) // min(tot.t)
             AS survival_permille
         FROM b a JOIN b b2 ON b2.lt >= a.lt CROSS JOIN tot
         GROUP BY a.lt ORDER BY a.lt""",
    "ev_decay_score" ->
      """WITH ref AS (SELECT max(ts) AS ref FROM events),
         x AS (SELECT event_type,
             (epoch_us(ref.ref) - epoch_us(ts)) // 604800000000 AS hl,
             CAST(floor(value * 1000) AS BIGINT) AS vu
           FROM events CROSS JOIN ref)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(vu) AS BIGINT) AS raw_units,
           CAST(sum((vu * 1000) // (CAST(1 AS BIGINT)
             << CAST(least(hl, 62) AS INT))) AS BIGINT) AS decay_units
         FROM x GROUP BY event_type
         ORDER BY decay_units DESC, event_type""",
    "ev_paths_topk" ->
      s"""WITH p AS (SELECT user_id,
             string_agg(event_type, ' > ' ORDER BY rn) AS path
           FROM (SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn
             FROM events)
           WHERE rn <= $PathSteps GROUP BY user_id)
         SELECT path, CAST(count(*) AS BIGINT) AS n_users
         FROM p GROUP BY path
         ORDER BY n_users DESC, path LIMIT 20""",
    "ev_stickiness" ->
      """WITH du AS (SELECT DISTINCT strftime(ts, '%Y-%m') AS month,
             CAST(ts AS DATE) AS day, user_id FROM events),
         dau AS (SELECT month, day, count(*) AS dau
           FROM du GROUP BY month, day),
         md AS (SELECT month, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(dau) AS BIGINT) AS sum_dau
           FROM dau GROUP BY month),
         mau AS (SELECT month, CAST(count(*) AS BIGINT) AS mau
           FROM (SELECT DISTINCT month, user_id FROM du) GROUP BY month)
         SELECT month, n_days, sum_dau, mau,
           (1000 * sum_dau) // (n_days * mau) AS stickiness_permille
         FROM md JOIN mau USING (month) ORDER BY month""")
}
