package graft.operators

import graft.{OpFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time windowing (SURVEY.md §2.9). These run here in BATCH mode over
  * the `events` table — `window`/`session_window` have identical semantics
  * under Structured Streaming (`readStream` + `withWatermark`), which is
  * covered by StreamingSpec with MemoryStream sources; keeping the batch
  * twins in the oracle set pins the time-bucketing arithmetic against
  * DuckDB.
  *
  * Scale notes: tumbling/sliding windows are plain hash aggregations on
  * (window, key) — map-side combined, linear. Session windows shuffle by
  * user and sort within partition (same cost shape as the MR secondary-sort
  * idiom); under streaming the same plan runs incrementally with state
  * eviction at the watermark.
  */
object StreamOps extends OpFamily {
  private val dec = DecimalType(18, 4)

  /** Tumbling 1-hour windows per event type: count + exact sum. */
  def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("sum_v"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("sum_v"))
      .orderBy(col("w_start"), col("event_type"))

  /** GAP-FILLED hourly series: [[tumbling]] leaves empty hours absent,
    * but downstream consumers (charting, anomaly detection, forecasting)
    * need a DENSE time spine. Build the complete hour sequence from the
    * observed min/max (sequence + explode — one row per hour, generated
    * distributed, never a driver loop), left-join the hourly aggregate
    * onto it, and zero-fill the gaps. The spine is data-bounded (hours
    * between observed extremes), so the explode is O(span), not O(rows).
    */
  /** OHLC downsampling — the financial/metrics resampler: per (event_type,
    * hour), the first value (open), max (high), min (low), last value
    * (close), count and exact decimal sum. First/last are pinned by
    * (ts, event_id) row_numbers — event_id breaks equal-timestamp ties
    * identically on both engines (DuckDB arg_min/arg_max cannot take a
    * composite ordering key, so both sides spell the window form). Both
    * row_number windows and the final aggregate share one
    * (event_type, hour) partitioning — a single shuffle, then one sort.
    */
  def ohlc(s: SparkSession, d: String): DataFrame =
    ohlcOn(Tables.events(s, d))

  private[graft] def ohlcOn(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = Seq(col("event_type"), col("w_start"))
    val wAsc = Window.partitionBy(keys: _*)
      .orderBy(col("ts"), col("event_id"))
    val wDesc = Window.partitionBy(keys: _*)
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("w_start", date_trunc("hour", col("ts")))
      .withColumn("rn_o", row_number().over(wAsc))
      .withColumn("rn_c", row_number().over(wDesc))
      .groupBy(keys: _*)
      .agg(max(when(col("rn_o") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn_c") === 1, col("value"))).as("close"),
        count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("sum_v"))
      .orderBy(col("event_type"), col("w_start"))
  }

  def gapFill(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("sum_v"))
      .select(col("w.start").as("h"), col("n"), col("sum_v"))
    val spine = hourly
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(expr(
        "sequence(h0, h1, INTERVAL 1 HOUR)")).as("h"))
    spine.join(hourly, Seq("h"), "left_outer")
      .select(col("h").as("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_v"), lit(0.0)).as("sum_v"))
      .orderBy(col("hour"))
  }

  /** LAG-k AUTOCORRELATION of the gap-filled hourly event-count series —
    * the seasonality read (a daily cycle shows as a peak at lag 24).
    * The [[gapFill]] spine makes the series DENSE and unit-spaced, so
    * every lag is one equi-join on the integer hour index, never a
    * window. All moments stay in integers: with n hours and count sum
    * S, the n-scaled centered term `c_t = n·x_t − S` is an exact
    * BIGINT, so ACF numerator Σ c_t·c_{t−k} and denominator Σ c_t² are
    * exact and the single final division is the only IEEE op — the
    * DuckDB replay is bit-identical. Headroom: |c| ≤ n·max(x), so the
    * sums hold to n³·max(x)² < 2⁶³ — a decade-long hourly series
    * (n ≈ 10⁵) with ~10⁴ events/hour; past that lift c to
    * decimal(38,0).
    *
    * Scale shape: the heavy work is ONE count-per-hour aggregate over
    * the raw events (map-side partials); everything after operates on
    * the span-bounded series (localCheckpoint'd — three consumers:
    * lag lhs, lag rhs, denominator), with the 1-row moment frame
    * broadcast. Lags multiply the series by |lags| via explode —
    * generated distributed, never a driver loop.
    */
  def autocorr(s: SparkSession, d: String): DataFrame =
    autocorrOn(Tables.events(s, d), Seq(1, 2, 3, 6, 12, 24))

  private[graft] def autocorrOn(events: DataFrame,
      lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1),
      s"autocorr lags must be >= 1: $lags")
    val hourly = events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("x"))
      .select(col("w.start").as("h"), col("x"))
    val spine = hourly
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(expr(
        "sequence(h0, h1, INTERVAL 1 HOUR)")).as("h"))
    val series = spine.join(hourly, Seq("h"), "left_outer")
      .select(expr("CAST(unix_timestamp(h) AS BIGINT) DIV 3600").as("t"),
        coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint() // two consumers: the moment row + centering
    val m = series.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val c = series.crossJoin(broadcast(m)) // 1-row moment frame
      .select(col("t"), (col("n") * col("x") - col("sx")).as("c"))
      .localCheckpoint() // three consumers: lhs, rhs, denominator
    val lhs = c
      .select(col("t"), col("c").as("ca"),
        explode(array(lags.map(lit(_)): _*)).as("lag"))
      .select(col("lag"), (col("t") - col("lag")).as("tp"), col("ca"))
    val rhs = c.select(col("t").as("tp"), col("c").as("cb"))
    val num = lhs.join(rhs, Seq("tp"))
      .groupBy(col("lag"))
      .agg(sum(col("ca") * col("cb")).as("num"),
        count(lit(1)).as("n_terms"))
    val den = c.agg(sum(col("c") * col("c")).as("den"),
      count(lit(1)).as("n_hours"))
    num.crossJoin(broadcast(den)) // 1-row denominator frame
      .select(col("lag").cast("long").as("lag"), col("n_hours"),
        col("n_terms"), col("num"), col("den"),
        (col("num").cast("double") / col("den").cast("double")).as("acf"))
      .orderBy(col("lag"))
  }

  /** Sliding 1-hour windows every 30 minutes (each event in 2 windows). */
  def sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("sum_v"))
      .select(col("w.start").as("w_start"), col("n"), col("sum_v"))
      .orderBy(col("w_start"))

  /** Rolling active users — exact distinct user count per sliding
    * 1-hour/30-minute window, the DAU/WAU metric shape. The distinct
    * aggregate expands to the two-phase (window, user) plan — linear,
    * map-side partials; at 100 TB swap for approx_count_distinct per
    * window (constant memory) or the HLL sketch union if windows must
    * merge downstream.
    */
  def slidingDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(col("w.start").as("w_start"), col("n_users"))
      .orderBy(col("w_start"))

  /** Session windows per user with a 17-minute inactivity gap: session
    * count, size, and bounds. (Odd gap length so no event-time diff can sit
    * exactly on the boundary, where half-open-interval semantics differ
    * between engines.)
    */
  def sessionize(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "17 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).cast("double").as("sum_v"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("n_events"), col("sum_v"))
      .orderBy(col("user_id"), col("sess_start"))

  /** Session summary per user: number of sessions and mean session length
    * in events (the canonical sessionize-then-describe pipeline).
    */
  def sessionStats(s: SparkSession, d: String): DataFrame =
    sessionize(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        (sum(col("n_events")).cast("double") / count(lit(1)))
          .as("events_per_session"))
      .orderBy(col("user_id"))

  /** Integral EWMA (exponential smoothing, α = 1/4) over the hourly sum
    * series per event type — the forecasting/anomaly-baseline consumer of
    * the tumbling aggregate. The recurrence e₁ = s₁;
    * eₕ = (sₕ + 3·eₕ₋₁) DIV 4 runs entirely in non-negative integer
    * micro-units, so the inherently ORDER-DEPENDENT fold is bit-exact on
    * both engines (Spark: per-key array fold; DuckDB: recursive CTE over
    * the row-numbered series) — no float accumulation drift ever.
    *
    * Scale shape: one (type, hour) hash aggregate with map-side partials
    * compresses the stream to the hourly grid, then the fold is O(series
    * length) per key — bounded by wall-clock hours (~10⁵ rows/key per
    * decade), never by event volume. Keys process in parallel; for an
    * unbounded/incremental variant the same recurrence runs in
    * transformWithState keyed by type (one long of state per key).
    */
  def ewma(s: SparkSession, d: String): DataFrame =
    ewmaOn(Tables.events(s, d))

  /** HOLT LINEAR TREND (double exponential smoothing, α = β = 1/4) over
    * the hourly sum series per event type — the trend-aware upgrade of
    * [[ewma]]: a level that tracks the series plus a trend that tracks
    * its slope, and the one-step forecast level+trend that a
    * capacity-planning / alerting consumer actually reads (EWMA lags a
    * ramp forever; Holt closes on it).
    *
    * Integral recurrence: l₁ = s₁, b₁ = 0;
    * lₕ = (sₕ + 3·(lₕ₋₁+bₕ₋₁)) >> 2, bₕ = (lₕ − lₕ₋₁ + 3·bₕ₋₁) >> 2.
    * The trend goes NEGATIVE on a falling series, where truncating DIV
    * and floor-division disagree — so both engines use the ARITHMETIC
    * RIGHT SHIFT (floor by 2² in Spark's shiftright and DuckDB's >>
    * alike, verified on negative BIGINTs), keeping the fold bit-exact
    * with no non-negativity contract at all. Same O(series) per-key
    * array fold as [[ewma]] (DuckDB: recursive CTE).
    */
  def holt(s: SparkSession, d: String): DataFrame =
    holtOn(Tables.events(s, d))

  private[graft] def holtOn(events: DataFrame): DataFrame =
    events
      .withColumn("w_start", date_trunc("hour", col("ts")))
      .groupBy(col("event_type"), col("w_start"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("sum_units"))
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("w_start"), col("sum_units"))))
        .as("arr"))
      .withColumn("lb_arr",
        expr("""aggregate(arr,
            CAST(array() AS ARRAY<STRUCT<l: BIGINT, b: BIGINT>>),
            (acc, x) -> array_append(acc,
              CASE WHEN size(acc) = 0
                THEN named_struct('l', x.sum_units, 'b', CAST(0 AS BIGINT))
                ELSE named_struct(
                  'l', shiftright(x.sum_units
                    + 3 * (element_at(acc, -1).l + element_at(acc, -1).b), 2),
                  'b', shiftright(shiftright(x.sum_units
                      + 3 * (element_at(acc, -1).l + element_at(acc, -1).b), 2)
                    - element_at(acc, -1).l + 3 * element_at(acc, -1).b, 2))
              END))"""))
      .select(col("event_type"),
        explode(arrays_zip(col("arr"), col("lb_arr"))).as("z"))
      .select(col("event_type"), col("z.arr.w_start").as("w_start"),
        col("z.arr.sum_units").as("sum_units"),
        col("z.lb_arr.l").as("level_units"),
        col("z.lb_arr.b").as("trend_units"),
        (col("z.lb_arr.l") + col("z.lb_arr.b")).as("forecast_units"))
      .orderBy(col("event_type"), col("w_start"))

  /** HOLT FORECAST BACKTEST — the measured instrument for the
    * forecasting family (kll/sim/dedup-report pattern): one-step-ahead
    * evaluation of [[holtOn]]'s hourly forecasts against what actually
    * arrived, per event type, after a 24-hour warm-up. The score is
    * SKILL vs the persistence baseline (forecast = last actual) in
    * permille: 1000·(1 − MAE_holt/MAE_naive), positive = the smoother
    * beats "tomorrow equals today", ≤ 0 = it adds nothing — the
    * go/no-go a capacity planner actually reads. All-integer: errors
    * are micro-unit BIGINT sums, the skill a floor division.
    */
  def holtBacktest(s: SparkSession, d: String): DataFrame =
    holtBacktestOn(Tables.events(s, d))

  private[graft] def holtBacktestOn(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("w_start"))
    holtOn(events)
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_fc", lag(col("forecast_units"), 1).over(w))
      .withColumn("prev_act", lag(col("sum_units"), 1).over(w))
      .filter(col("rn") > 24)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_evals"),
        sum(abs(col("sum_units") - col("prev_fc"))).as("holt_abs_units"),
        sum(abs(col("sum_units") - col("prev_act"))).as("naive_abs_units"))
      .withColumn("skill_permille",
        when(col("naive_abs_units") > 0,
          lit(1000L) - expr("holt_abs_units * 1000 DIV naive_abs_units")))
      .orderBy(col("event_type"))
  }

  /** BATCH CUSUM SCAN — the event-time twin of the streaming
    * [[graft.streaming.StreamPipelines.CusumProcessor]]: per event type,
    * detect a sustained level shift in the hourly sum series. The first
    * 24 hours are the self-calibrating training window (baseline = their
    * integral mean, slack = baseline/20, threshold = baseline/2 — all
    * derived from the data, nothing wall-clock or hand-tuned enters an
    * oracle-checked query); post-training hours run the NO-RESET tabular
    * CUSUM via the scan identity S⁺ₙ = RSₙ − min(0, min_{k≤n} RS_k)
    * (RS = running sum of the slack-adjusted deviations) — Page's
    * recurrence without max() per row, so TWO window running aggregates
    * replace an inherently sequential fold and the whole thing stays in
    * exact BIGINTs. Equals the streaming processor's trajectory
    * bit-for-bit up to each key's FIRST alarm (the processor then
    * resets; the batch scan reports that first change-point —
    * equivalence property in StreamingSpec).
    *
    * Scale shape: one (type, hour) map-side-partial aggregate compresses
    * events to the hourly grid, then four running-window passes over one
    * type-partitioned sort — O(hours) per key, parallel across keys,
    * bounded output (one summary row per type).
    */
  def cusumScan(s: SparkSession, d: String): DataFrame =
    cusumScanOn(Tables.events(s, d), trainHours = 24)

  private[graft] def cusumScanOn(events: DataFrame,
      trainHours: Int): DataFrame = {
    val series = events
      .withColumn("w_start", date_trunc("hour", col("ts")))
      .groupBy(col("event_type"), col("w_start"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("sum_units"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("w_start"))
    val rs = series.withColumn("rn", row_number().over(wOrd))
    val bl = rs.filter(col("rn") <= trainHours)
      .groupBy(col("event_type"))
      .agg(expr("sum(sum_units) DIV count(1)").as("baseline_units"))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("w_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rs.filter(col("rn") > trainHours)
      .join(broadcast(bl), Seq("event_type"))
      .withColumn("slack", expr("baseline_units DIV 20"))
      .withColumn("thr", expr("baseline_units DIV 2"))
      .withColumn("rsu",
        sum(col("sum_units") - col("baseline_units") - col("slack"))
          .over(wRun))
      .withColumn("rsn",
        sum(col("baseline_units") - col("slack") - col("sum_units"))
          .over(wRun))
      .withColumn("sp", col("rsu") - least(lit(0L), min(col("rsu")).over(wRun)))
      .withColumn("sn", col("rsn") - least(lit(0L), min(col("rsn")).over(wRun)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        max(col("baseline_units")).as("baseline_units"),
        max(col("sp")).as("max_sp"), max(col("sn")).as("max_sn"),
        min(when(col("sp") > col("thr") || col("sn") > col("thr"),
          col("w_start"))).as("first_alarm"))
      .orderBy(col("event_type"))
  }

  private[graft] def ewmaOn(events: DataFrame): DataFrame =
    ewmaCore(events).orderBy(col("event_type"), col("w_start"))

  /** Unordered (event_type, w_start, sum_units, ewma_units) rows — the
    * shared core of [[ewma]] and [[anomaly]].
    */
  private def ewmaCore(events: DataFrame): DataFrame =
    events
      .withColumn("w_start", date_trunc("hour", col("ts")))
      .groupBy(col("event_type"), col("w_start"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("sum_units"))
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("w_start"), col("sum_units"))))
        .as("arr"))
      .withColumn("ewma_arr",
        expr("aggregate(arr, CAST(array() AS ARRAY<BIGINT>), " +
          "(acc, x) -> array_append(acc, " +
          "CASE WHEN size(acc) = 0 THEN x.sum_units " +
          "ELSE (x.sum_units + 3 * element_at(acc, -1)) div 4 END))"))
      .select(col("event_type"),
        explode(arrays_zip(col("arr"), col("ewma_arr"))).as("z"))
      .select(col("event_type"), col("z.arr.w_start").as("w_start"),
        col("z.arr.sum_units").as("sum_units"),
        col("z.ewma_arr").as("ewma_units"))

  /** Most-anomalous hours against the EWMA baseline — the alerting
    * consumer of [[ewma]]: hour h's deviation is measured against the
    * PRIOR hour's smoothed baseline e₍ₕ₋₁₎ (integral per-mille rule:
    * (1000·|sₕ − eₕ₋₁|) DIV max(eₕ₋₁, 1) — the baseline excludes the
    * hour under test, so a spike cannot vouch for itself). First hour of
    * each series has no prior baseline and is exempt. The REGISTERED
    * query reports the top-20 deviant hours under the total order
    * (dev desc, type, hour) — a fixed absolute threshold stops
    * discriminating as data grows (at sf0.1 hourly sums are 10× smoother
    * and a 3000‰ cut flags NOTHING, making the oracle compare vacuous);
    * top-k by relative deviation discriminates at every scale. The
    * thresholded alerting variant stays on [[anomalyOn]] /
    * `Graft.anomalies`. Same integer arithmetic end-to-end, so rows
    * replay exactly in DuckDB; (type, hour) is unique so the ordering is
    * total and the LIMIT deterministic.
    */
  def anomaly(s: SparkSession, d: String): DataFrame =
    deviations(Tables.events(s, d))
      .orderBy(col("dev_permille").desc, col("event_type"), col("w_start"))
      .limit(20)

  /** Per-hour deviation vs the prior hour's EWMA baseline (unfiltered). */
  private def deviations(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("w_start"))
    ewmaCore(events)
      .withColumn("baseline_units", lag(col("ewma_units"), 1).over(w))
      .filter(col("baseline_units").isNotNull)
      .withColumn("dev_permille",
        expr("(1000 * abs(sum_units - baseline_units))" +
          " div greatest(baseline_units, 1L)"))
      .select(col("event_type"), col("w_start"), col("sum_units"),
        col("baseline_units"), col("dev_permille"))
  }

  private[graft] def anomalyOn(events: DataFrame,
      thresholdPermille: Long): DataFrame =
    deviations(events)
      .filter(col("dev_permille") >= thresholdPermille)
      .orderBy(col("event_type"), col("w_start"))

  val queries = Map(
    "stream_tumbling" -> (tumbling _),
    "stream_ewma" -> (ewma _),
    "stream_anomaly" -> (anomaly _),
    "stream_cusum" -> (cusumScan _),
    "stream_holt" -> (holt _),
    "stream_holt_backtest" -> (holtBacktest _),
    "stream_gapfill" -> (gapFill _),
    "stream_autocorr" -> (autocorr _),
    "stream_ohlc" -> (ohlc _),
    "stream_sliding_distinct" -> (slidingDistinct _),
    "stream_sliding" -> (sliding _),
    "stream_session" -> (sessionize _),
    "stream_session_stats" -> (sessionStats _))

  private val sessionCte =
    """sess AS (
         SELECT user_id, ts, value,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM (
           SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
             CASE WHEN CAST(ts AS TIMESTAMP)
                 - lag(CAST(ts AS TIMESTAMP), 1, TIMESTAMP '1970-01-01')
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 > INTERVAL '17 minutes' THEN 1 ELSE 0 END AS new_sess
           FROM events))"""

  val oracle = Map(
    "stream_cusum" ->
      """WITH series AS (SELECT event_type,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
             CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS su
           FROM events GROUP BY event_type, w_start),
         rs AS (SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY w_start) AS rn FROM series),
         bl AS (SELECT event_type,
             CAST(sum(su) AS BIGINT) // count(*) AS bl
           FROM rs WHERE rn <= 24 GROUP BY event_type),
         acc AS (SELECT rs.event_type, rs.w_start, rs.su, bl.bl,
             bl.bl // 20 AS slack, bl.bl // 2 AS thr,
             CAST(sum(rs.su - bl.bl - bl.bl // 20) OVER wp AS BIGINT) AS rsu,
             CAST(sum(bl.bl - bl.bl // 20 - rs.su) OVER wp AS BIGINT) AS rsn
           FROM rs JOIN bl USING (event_type) WHERE rn > 24
           WINDOW wp AS (PARTITION BY event_type ORDER BY w_start
             ROWS UNBOUNDED PRECEDING)),
         sc AS (SELECT *,
             rsu - least(CAST(0 AS BIGINT), min(rsu) OVER wp) AS sp,
             rsn - least(CAST(0 AS BIGINT), min(rsn) OVER wp) AS sn
           FROM acc
           WINDOW wp AS (PARTITION BY event_type ORDER BY w_start
             ROWS UNBOUNDED PRECEDING))
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
           max(bl) AS baseline_units,
           CAST(max(sp) AS BIGINT) AS max_sp,
           CAST(max(sn) AS BIGINT) AS max_sn,
           min(CASE WHEN sp > thr OR sn > thr THEN w_start END)
             AS first_alarm
         FROM sc GROUP BY event_type ORDER BY event_type""",
    "stream_gapfill" ->
      """WITH hourly AS (
           SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS h,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
           FROM events WHERE event_type = 'purchase' GROUP BY h),
         spine AS (SELECT unnest(generate_series(
             (SELECT min(h) FROM hourly), (SELECT max(h) FROM hourly),
             INTERVAL '1 hour')) AS h)
         SELECT spine.h AS hour, coalesce(n, 0) AS n,
           coalesce(sum_v, 0.0) AS sum_v
         FROM spine LEFT JOIN hourly ON spine.h = hourly.h
         ORDER BY hour""",
    "stream_autocorr" ->
      """WITH hourly AS (
           SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS h,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY h),
         spine AS (SELECT unnest(generate_series(
             (SELECT min(h) FROM hourly), (SELECT max(h) FROM hourly),
             INTERVAL '1 hour')) AS h),
         series AS (SELECT
             CAST(floor(epoch(spine.h)) AS BIGINT) // 3600 AS t,
             coalesce(x, 0) AS x
           FROM spine LEFT JOIN hourly ON spine.h = hourly.h),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx FROM series),
         c AS (SELECT t, n * x - sx AS c FROM series, m),
         lags AS (SELECT unnest([1, 2, 3, 6, 12, 24]) AS lag),
         num AS (SELECT lag,
             CAST(sum(a.c * b.c) AS BIGINT) AS num,
             CAST(count(*) AS BIGINT) AS n_terms
           FROM lags CROSS JOIN c a JOIN c b ON b.t = a.t - lags.lag
           GROUP BY lag),
         den AS (SELECT CAST(sum(c * c) AS BIGINT) AS den,
             CAST(count(*) AS BIGINT) AS n_hours FROM c)
         SELECT CAST(lag AS BIGINT) AS lag, n_hours, n_terms, num, den,
           CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS acf
         FROM num, den ORDER BY lag""",
    "stream_sliding_distinct" ->
      """SELECT w_start, count(DISTINCT user_id) AS n_users
         FROM (SELECT unnest([
             time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
             time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
               - INTERVAL '30 minutes']) AS w_start, user_id
           FROM events)
         GROUP BY w_start ORDER BY w_start""",
    "stream_holt" ->
      """WITH RECURSIVE h AS (
           SELECT event_type,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
             CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
               AS sum_units
           FROM events GROUP BY 1, 2),
         hr AS (SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY w_start) AS rn FROM h),
         e AS (
           SELECT event_type, w_start, sum_units, rn,
             sum_units AS l, CAST(0 AS BIGINT) AS b
           FROM hr WHERE rn = 1
           UNION ALL
           SELECT hr.event_type, hr.w_start, hr.sum_units, hr.rn,
             (hr.sum_units + 3 * (e.l + e.b)) >> 2,
             (((hr.sum_units + 3 * (e.l + e.b)) >> 2) - e.l + 3 * e.b) >> 2
           FROM hr JOIN e ON hr.event_type = e.event_type
             AND hr.rn = e.rn + 1)
         SELECT event_type, w_start, sum_units, l AS level_units,
           b AS trend_units, l + b AS forecast_units
         FROM e ORDER BY event_type, w_start""",
    "stream_holt_backtest" ->
      """WITH RECURSIVE h AS (
           SELECT event_type,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
             CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
               AS sum_units
           FROM events GROUP BY 1, 2),
         hr AS (SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY w_start) AS rn FROM h),
         e AS (
           SELECT event_type, w_start, sum_units, rn,
             sum_units AS l, CAST(0 AS BIGINT) AS b
           FROM hr WHERE rn = 1
           UNION ALL
           SELECT hr.event_type, hr.w_start, hr.sum_units, hr.rn,
             (hr.sum_units + 3 * (e.l + e.b)) >> 2,
             (((hr.sum_units + 3 * (e.l + e.b)) >> 2) - e.l + 3 * e.b) >> 2
           FROM hr JOIN e ON hr.event_type = e.event_type
             AND hr.rn = e.rn + 1),
         x AS (SELECT event_type, rn, sum_units,
             lag(l + b) OVER (PARTITION BY event_type ORDER BY rn)
               AS prev_fc,
             lag(sum_units) OVER (PARTITION BY event_type ORDER BY rn)
               AS prev_act
           FROM e),
         m AS (SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_evals,
             CAST(sum(abs(sum_units - prev_fc)) AS BIGINT)
               AS holt_abs_units,
             CAST(sum(abs(sum_units - prev_act)) AS BIGINT)
               AS naive_abs_units
           FROM x WHERE rn > 24 GROUP BY event_type)
         SELECT event_type, n_evals, holt_abs_units, naive_abs_units,
           CASE WHEN naive_abs_units > 0
             THEN 1000 - holt_abs_units * 1000 // naive_abs_units
           END AS skill_permille
         FROM m ORDER BY event_type""",
    "stream_ewma" ->
      """WITH RECURSIVE h AS (
           SELECT event_type,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
             CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
               AS sum_units
           FROM events GROUP BY 1, 2),
         hr AS (SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY w_start) AS rn FROM h),
         e AS (
           SELECT event_type, w_start, sum_units, rn,
             sum_units AS ewma_units
           FROM hr WHERE rn = 1
           UNION ALL
           SELECT hr.event_type, hr.w_start, hr.sum_units, hr.rn,
             (hr.sum_units + 3 * e.ewma_units) // 4
           FROM hr JOIN e ON hr.event_type = e.event_type
             AND hr.rn = e.rn + 1)
         SELECT event_type, w_start, sum_units, ewma_units
         FROM e ORDER BY event_type, w_start""",
    "stream_anomaly" ->
      """WITH RECURSIVE h AS (
           SELECT event_type,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
             CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
               AS sum_units
           FROM events GROUP BY 1, 2),
         hr AS (SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY w_start) AS rn FROM h),
         e AS (
           SELECT event_type, w_start, sum_units, rn,
             sum_units AS ewma_units
           FROM hr WHERE rn = 1
           UNION ALL
           SELECT hr.event_type, hr.w_start, hr.sum_units, hr.rn,
             (hr.sum_units + 3 * e.ewma_units) // 4
           FROM hr JOIN e ON hr.event_type = e.event_type
             AND hr.rn = e.rn + 1),
         lagged AS (SELECT event_type, w_start, sum_units,
             lag(ewma_units) OVER (PARTITION BY event_type
               ORDER BY w_start) AS baseline_units
           FROM e)
         SELECT event_type, w_start, sum_units, baseline_units,
           (1000 * abs(sum_units - baseline_units))
             // greatest(baseline_units, 1) AS dev_permille
         FROM lagged
         WHERE baseline_units IS NOT NULL
         ORDER BY dev_permille DESC, event_type, w_start
         LIMIT 20""",
    "stream_ohlc" ->
      """WITH e AS (SELECT event_type, event_id,
             CAST(ts AS TIMESTAMP) AS ts, value,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start
           FROM events),
         r AS (SELECT *,
             row_number() OVER (PARTITION BY event_type, w_start
               ORDER BY ts, event_id) AS rn_o,
             row_number() OVER (PARTITION BY event_type, w_start
               ORDER BY ts DESC, event_id DESC) AS rn_c
           FROM e)
         SELECT event_type, w_start,
           max(CASE WHEN rn_o = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           max(CASE WHEN rn_c = 1 THEN value END) AS close,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
         FROM r GROUP BY event_type, w_start
         ORDER BY event_type, w_start""",
    "stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w_start,
           event_type, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
         FROM events GROUP BY w_start, event_type
         ORDER BY w_start, event_type""",
    "stream_sliding" ->
      """SELECT w_start, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
         FROM (SELECT unnest([
             time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
             time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
               - INTERVAL '30 minutes']) AS w_start, value
           FROM events)
         GROUP BY w_start ORDER BY w_start""",
    "stream_session" ->
      s"""WITH $sessionCte
         SELECT user_id, min(ts) AS sess_start, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
         FROM sess GROUP BY user_id, sid
         ORDER BY user_id, sess_start""",
    "stream_session_stats" ->
      s"""WITH $sessionCte,
         per AS (SELECT user_id, sid, count(*) AS n_events
                 FROM sess GROUP BY user_id, sid)
         SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n_events) AS DOUBLE) / count(*) AS events_per_session
         FROM per GROUP BY user_id ORDER BY user_id""")
}
