package graft.operators

import graft.{OpFamily, Tables}
import graft.functions.Num.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The join pattern family (SURVEY.md §2.4 / MRDP ch.5). In the reference
  * every join is a hand-written reduce-side or replicated-map-side idiom;
  * here each is one declarative join and Catalyst+AQE pick the physical
  * strategy (SortMergeJoin for big×big, BroadcastHashJoin for small dims —
  * `broadcast()` is pinned where a side is a bounded dimension like
  * nation/region, which is exactly the replicated-join decision made once,
  * correctly, at the planner level instead of per-job by the user).
  *
  * The as-of join is implemented with the scalable union+window idiom: one
  * shuffle on the key, one sort within partitions — the same cost shape a
  * purpose-built merge join would have, with no cross product anywhere.
  */
object JoinOps extends OpFamily {

  /** Reduce-side 3-way equi-join + agg + top-k (TPC-H Q3 shape). */
  def join3TopK(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    val l = Tables.lineitem(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  /** 5-way star join with broadcast dims (TPC-H Q5 shape, replicated join). */
  def join5Star(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d)
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Left outer join: customers with their order count, zeros kept. */
  def leftOuterOrders(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .filter(col("c_custkey") <= 500)
      .orderBy(col("c_custkey"))
  }

  /** Right outer join: orders kept even when the (filtered) customer side
    * has no match — the mirror of [[leftOuterOrders]], completing the
    * inner/left/right/full equi-join family. Planner-wise identical to a
    * left join with sides swapped; registered so the surface is explicit.
    */
  def rightOuterOrders(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
    val o = Tables.orders(s, d).filter(col("o_orderkey") <= 2000)
    c.join(o, c("c_custkey") === o("o_custkey"), "right_outer")
      .select(o("o_orderkey"),
        c("c_custkey").isNotNull.as("has_rich_customer"),
        coalesce(c("c_acctbal"), lit(0.0)).as("acctbal"))
      .orderBy(o("o_orderkey"))
  }

  /** Full outer join of two derived key sets (tagged-union MR idiom). */
  def fullOuter(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id").as("k")).distinct()
    val cu = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k")).distinct()
    ev.join(cu, ev("k") === cu("k"), "full_outer")
      .select(
        coalesce(ev("k"), cu("k")).as("k"),
        ev("k").isNotNull.as("in_events"),
        cu("k").isNotNull.as("in_customer"))
      .orderBy(col("k"))
  }

  /** Left-semi join: customers that have at least one 'P' order (EXISTS). */
  def semiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join: customers with no large order (NOT EXISTS). */
  def antiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_nationkey"))
      .orderBy(col("c_custkey"))
  }

  /** Cartesian product (bounded dims only — it's O(n·m) by construction). */
  def crossJoinRegions(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).select(col("r_name"))
    val n = Tables.nation(s, d).select(col("n_name"))
    r.crossJoin(n).orderBy(col("r_name"), col("n_name"))
  }

  /** Theta join: same-brand part pairs with strictly larger size — equi on
    * the brand key plus a residual range predicate.
    *
    * r14 SCALE FIX (the sf0.1→sf0.3 ScalingAudit decade caught the old
    * row-level form at 43× time for 3× data): the query only needs
    * per-brand AGGREGATES of the pair set, so materializing the
    * O(n²/brand) pairs was pure waste — 360M joined rows at sf0.3 for a
    * 5-row answer, a genuine 100 TB killer. The theta join now runs
    * over the (brand, size, count) HISTOGRAM (p_size has ≤ 50 distinct
    * values, so each side is ≤ |brands|·50 rows NO MATTER the data
    * size) and weights by the count product: n_pairs = Σ c₁·c₂ over
    * size₁ < size₂ — identical output, and the only data-sized work is
    * one map-side-combining aggregate. Post-fix decade ratio: ~1×.
    * The pattern generalizes: aggregate-over-theta-pairs should theta-
    * join the pre-aggregated key histogram whenever the residual
    * predicate only reads grouped columns.
    */
  def thetaJoinParts(s: SparkSession, d: String): DataFrame = {
    val h = Tables.part(s, d)
      .groupBy(col("p_brand").as("brand"), col("p_size").as("size"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // two consumers: both sides of the theta join
    val h2 = h.select(col("brand").as("brand2"), col("size").as("size2"),
      col("c").as("c2"))
    h.join(h2,
        col("brand") === col("brand2") && col("size") < col("size2"))
      .groupBy(col("brand"))
      .agg(sum(col("c") * col("c2")).as("n_pairs"),
        max(col("size2") - col("size")).as("max_gap"))
      .orderBy(col("brand"))
  }

  /** Range join against a small banded dimension: broadcast nested-loop on
    * an interval predicate (the MR "binning" idiom, planner-chosen BNLJ).
    */
  def rangeJoinBands(s: SparkSession, d: String): DataFrame = {
    val bands = s.createDataFrame(Seq(
      ("low", 0.0, 50.0), ("mid", 50.0, 120.0), ("high", 120.0, 1e9)
    )).toDF("band", "lo", "hi")
    Tables.events(s, d)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .orderBy(col("band"))
  }

  /** As-of join (nearest purchase at ts ≤ click ts, per user), via the
    * union + "last non-null over ordered window" idiom: one shuffle on
    * user_id, one in-partition sort — the scalable MR "secondary sort +
    * stateful reducer" pattern expressed declaratively. Purchase rows sort
    * before click rows at equal ts so ties count as matches.
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "purchase", col("event_id")).as("pid"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), when(col("pid").isNull, 1).otherwise(0), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_purchase_id", last(col("pid"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("last_purchase_id"))
      .orderBy(col("event_id"))
  }

  /** NEAREST-event join — the bidirectional refinement of [[asofJoin]]:
    * each click matched to the temporally closest purchase by the same
    * user, before OR after (ties → the earlier purchase). Same
    * sort-merge-free shape as as-of: union both event types into ONE
    * relation, one window pass per direction (last purchase at-or-before,
    * first at-or-after via ignoreNulls frames), pick the smaller |Δ| —
    * never a click×purchase product, and both windows share the
    * (user_id, ts) sort so Catalyst plans a single Exchange+Sort. The
    * delta stays in raw signed MICROSECONDS: a `DIV` here would diverge
    * between engines on negative deltas (Spark truncates toward zero,
    * DuckDB floors), so no division happens at all.
    */
  def nearestJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "purchase",
          struct(col("ts").as("pts"), col("event_id").as("pid"))).as("p"))
    val ord = Seq(col("ts"),
      when(col("p").isNull, 1).otherwise(0), col("event_id"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id")).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev
      .withColumn("prev", last(col("p"), ignoreNulls = true).over(wPrev))
      .withColumn("nxt", first(col("p"), ignoreNulls = true).over(wNext))
      .filter(col("event_type") === "click")
      .withColumn("d_prev",
        unix_micros(col("ts")) - unix_micros(col("prev.pts")))
      .withColumn("d_next",
        unix_micros(col("nxt.pts")) - unix_micros(col("ts")))
      .withColumn("take_prev", col("prev").isNotNull &&
        (col("nxt").isNull || col("d_prev") <= col("d_next")))
      .filter(col("prev").isNotNull || col("nxt").isNotNull)
      .select(col("event_id"), col("user_id"),
        when(col("take_prev"), col("prev.pid"))
          .otherwise(col("nxt.pid")).as("nearest_pid"),
        when(col("take_prev"), -col("d_prev"))
          .otherwise(col("d_next")).as("delta_us"))
      .orderBy(col("event_id"))
  }

  /** Skew-mitigated (salted) join: the fact side gets a random-ish but
    * DETERMINISTIC salt (hash-mod of a fine-grained column), the dimension
    * side is replicated once per salt value, and the join runs on
    * (key, salt) — so one hot key spreads over `Salts` reducers instead of
    * one. The result is provably identical to the unsalted join, which is
    * exactly what the oracle checks. (AQE's skewedJoin does this
    * adaptively; this is the explicit form for engines/pipelines that need
    * it pinned.)
    */
  def saltedSkewJoin(s: SparkSession, d: String): DataFrame = {
    val Salts = 8
    val fact = Tables.lineitem(s, d)
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"),
        col("l_linenumber")), lit(Salts)))
    val dim = Tables.supplier(s, d)
      .withColumn("salt", explode(array((0 until Salts).map(lit): _*)))
    fact.join(dim,
        fact("l_suppkey") === dim("s_suppkey") &&
          fact("salt") === dim("salt"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("s_suppkey"))
  }

  /** INTERVAL-OVERLAP self-join at scale: which user pairs had concurrent
    * activity sessions, and how often. Two stages, both classic MR idioms:
    *
    * 1. Lag-gap sessionization (the secondary-sort reducer expressed as
    *    windows): order each user's events, cut a session when the gap
    *    exceeds 17 min, aggregate [min, max] µs bounds per session.
    * 2. Overlap join via TIME BINNING: an interval join has no equi key,
    *    and a raw theta join of two unbounded sides is quadratic. Explode
    *    each session onto the 1-hour epoch buckets it covers (sessions are
    *    minutes long, so 1–2 buckets each), equi-join on bucket, verify
    *    the exact closed-interval overlap as a residual, and emit each
    *    pair only from the FIRST bucket both intervals cover
    *    (bk = ⌊max(st_a, st_b) / bucket⌋ — overlapping intervals both
    *    contain the later start, so that bucket always exists): exactly
    *    once per pair as a codegen'd filter, with no distinct() shuffle
    *    over the candidate set. Candidates are Σ_bucket n_b² instead of
    *    N² — bounded by true temporal co-location; a peak-hour bucket is
    *    an AQE-splittable hot key. At 100 TB the bucket width is the one
    *    knob: ~the typical interval length.
    *
    * All arithmetic is exact integer µs (unix_micros ↔ DuckDB epoch_us),
    * so the oracle replays sessionization and overlap bit-for-bit.
    */
  def intervalOverlapJoin(s: SparkSession, d: String): DataFrame = {
    val sess = sessionIntervals(
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us")),
      gapUs = 17L * 60 * 1000000)
      .localCheckpoint() // session build feeds BOTH sides of the pair join
    overlapPairs(sess, bucketUs = 3600L * 1000000)
      .groupBy(col("ua"), col("ub"))
      .agg(count(lit(1)).as("n_overlaps"))
      .orderBy(col("ua"), col("ub"))
  }

  /** Lag-gap sessionization core: (user_id, sid, st, en) µs intervals from
    * a (user_id, event_id, us) frame. A gap must EXCEED gapUs to cut
    * (strictly-greater, so an exactly-gap-sized silence stays one
    * session) — boundary pinned in IntervalJoinSpec.
    */
  private[graft] def sessionIntervals(ev: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("ns", when(col("prev").isNull ||
        col("us") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(wsum))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("st"), max(col("us")).as("en"))
  }

  /** Time-binned interval-overlap pair core over a (user_id, sid, st, en)
    * frame: every cross-user pair of CLOSED intervals that intersect
    * (touching endpoints count), each pair exactly once regardless of how
    * many buckets it shares — the exactly-once bucket trick: a pair is
    * emitted only when the join bucket is the first one BOTH intervals
    * cover, ⌊max(sta, stb) / bucket⌋. That bucket is covered by both sides
    * whenever they overlap (max(st) ≤ min(en)), so no true pair is lost,
    * and it is unique, so no pair repeats — a per-row codegen filter in
    * place of a distinct() shuffle over every bucket-shared candidate
    * (measured 13.4M candidate rows at sf0.1 for 464 output pairs).
    */
  private[graft] def overlapPairs(sess: DataFrame, bucketUs: Long): DataFrame = {
    val binned = sess.select(col("user_id"), col("sid"), col("st"), col("en"),
      explode(sequence(expr(s"st DIV $bucketUs"), expr(s"en DIV $bucketUs")))
        .as("bk"))
    val a = binned.select(col("bk"), col("user_id").as("ua"),
      col("sid").as("sa"), col("st").as("sta"), col("en").as("ena"))
    val b = binned.select(col("bk"), col("user_id").as("ub"),
      col("sid").as("sb"), col("st").as("stb"), col("en").as("enb"))
    a.join(b, Seq("bk"))
      .filter(col("ua") < col("ub"))
      .filter(col("sta") <= col("enb") && col("stb") <= col("ena"))
      .filter(col("bk") === expr(s"greatest(sta, stb) DIV $bucketUs"))
      .select(col("ua"), col("sa"), col("ub"), col("sb"))
  }

  /** Exact edit-distance-≤1 self-join (fuzzy key match / record linkage)
    * over customer names: every pair of names within Levenshtein distance 1.
    */
  def editDistanceJoin(s: SparkSession, d: String): DataFrame =
    editDistancePairsOn(
      Tables.customer(s, d).select(col("c_custkey"), col("c_name")),
      "c_custkey", "c_name")

  /** Exact edit-distance-≤3 self-join over SUPPLIER names — the d ≥ 3
    * regime where candidate generation must be the PassJoin segment index
    * (deletion neighborhoods would emit O(len³) ≈ 1000 keys per row
    * here). The zero-padded name suffixes make every same-table pair
    * differ in ≤ 3 digit positions, so the TRUE output is dense
    * (quadratic in the supplier count) — suppliers are the bounded
    * dimension that keeps an intentionally-dense fixture small, while
    * customer names stay on the d = 1 member above.
    */
  def editDistance3Join(s: SparkSession, d: String): DataFrame =
    editDistancePairsOn(
      Tables.supplier(s, d).select(col("s_suppkey"), col("s_name")),
      "s_suppkey", "s_name", maxDist = 3)

  /** Exact Levenshtein-≤1 pair core over any (id, string) frame — the
    * [[graft.api.Graft.editDistancePairs]] entry point.
    *
    * Candidate generation is DELETION NEIGHBORHOODS (the FastSS family,
    * Bocek et al., ETH TR 2007; popularized as SymSpell — public
    * knowledge): ed(r, s) ≤ 1 iff D(r) ∩ D(s) ≠ ∅, where D(x) is x plus
    * every string obtained by deleting one character of x. Substitution at
    * position i ⇒ both sides share the i-deleted string; insert/delete ⇒
    * the longer side's deletion hits the shorter string itself. So an
    * equi-join on the O(len) neighborhood keys yields a candidate SUPERSET
    * and the exact banded-Levenshtein verify makes the output identical to
    * the quadratic all-pairs join — same exactness-via-prefiltering shape
    * as [[DedupOps.blockedJaccardPairs]], for edit distance instead of
    * Jaccard. At 100 TB: per-row work O(len) keys, one 8-byte-key
    * equi-join (xxhash64 of the variant; hash collisions only ADD
    * candidates, the verify removes them), no block ever goes all-pairs.
    * A hot key means many genuinely-near-identical strings — AQE-
    * splittable, and exactly the rows a linkage run is looking for.
    */
  private[graft] def editDistancePairsOn(df: DataFrame, idCol: String,
      strCol: String, maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 6,
      s"editDistancePairs supports maxDist 1..6, got $maxDist " +
        "(the banded verify and the PassJoin probe window both grow " +
        "linearly in d — past ~6 a similarity join on q-grams fits better)")
    val base = df.select(col(idCol).as("id"), col(strCol).as("str"))
    // candidate generation dispatch: deletion neighborhoods win for d ≤ 2
    // (O(len^d) keys, no position windows); the PassJoin segment index
    // wins past that (O(d²·(2d+1)) keys per row, length-independent
    // exponent)
    val cand =
      if (maxDist <= 2) fastSsCandidates(base, maxDist)
      else passJoinCandidates(base, maxDist)
    // banded verify: levenshtein with threshold short-circuits the DP row
    // past the band, returning -1 above the cut — O(len·d) per candidate,
    // not O(len²)
    cand
      .join(base.select(col("id").as("a"), col("str").as("sa")), Seq("a"))
      .join(base.select(col("id").as("b"), col("str").as("sb")), Seq("b"))
      .withColumn("dist",
        levenshtein(col("sa"), col("sb"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("a"), col("b"), col("dist"))
      .orderBy(col("a"), col("b"))
  }

  /** FastSS deletion-neighborhood candidate pairs (a < b), a complete
    * superset of all pairs with ed ≤ maxDist ∈ {1, 2}.
    *
    * D≤d(x) hashed: x, every single-character deletion, and (d = 2)
    * every two-character deletion. ed(r, s) ≤ d ⟹ D≤d(r) ∩ D≤d(s) ≠ ∅
    * (align r and s; deleting each side's unmatched positions — at most
    * d per side — leaves the same subsequence), so the equi-join on
    * neighborhood keys is a complete candidate generator. sequence(1,
    * len) on an empty string yields [1, 0] (negative-step fallback);
    * ghost indices only produce ghost variants, which can add candidates
    * but never drop true pairs, and array_distinct folds the duplicates.
    */
  private def fastSsCandidates(base: DataFrame, maxDist: Int): DataFrame = {
    val str = col("str")
    val L = length(str)
    val del1 = transform(sequence(lit(1), L), i =>
      concat(str.substr(lit(1), i - 1), str.substr(i + 1, L - i)))
    val variants =
      if (maxDist == 1) concat(array(str), del1)
      else concat(array(str), del1,
        // delete positions i < j of the ORIGINAL string in one pass
        flatten(transform(sequence(lit(1), L - 1), i =>
          transform(sequence(i + 1, L), j =>
            concat(str.substr(lit(1), i - 1),
              str.substr(i + 1, j - i - 1),
              str.substr(j + 1, L - j))))))
    val keys = base.select(col("id"),
        explode(array_distinct(variants)).as("v"))
      .select(col("id"), xxhash64(col("v")).as("k"))
      .distinct()
    keys.select(col("id").as("a"), col("k"))
      .join(keys.select(col("id").as("b"), col("k")), Seq("k"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** PassJoin segment-index candidate pairs (a < b), a complete superset
    * of all pairs with ed ≤ maxDist — the structure for d ≥ 3, where
    * deletion neighborhoods blow up as len^d (Li/Deng/Feng's PassJoin
    * partition scheme, public: VLDB'11).
    *
    * Index side: every string s of length l is split into k = d+1 even
    * segments (first l mod k segments one char longer — closed-form
    * start/length per (l, i)). Pigeonhole: ≤ d edit ops each touch at
    * most one segment of s (insertions into the other string touch
    * none), so some segment is edit-free and appears VERBATIM in any
    * string r with ed(r, s) ≤ d, shifted by the insert/delete balance of
    * the ops before it. Probe side: r emits, for each indexed length
    * l ∈ [len(r)−d, len(r)] and segment i, every substring of r with
    * that segment's length starting inside the POSITION-AWARE window
    * [p−⌊(d−Δ)/2⌋, p+⌊(d+Δ)/2⌋], Δ = len(r)−l: with ins−del = Δ and
    * ins+del+sub ≤ d, at most ⌊(d−Δ)/2⌋ deletions and ⌊(d+Δ)/2⌋
    * insertions can precede any segment, so the window is complete and
    * roughly HALF the naive ±d one (at Δ = 0 it is exactly ±⌊d/2⌋) —
    * candidates halve at zero recall cost, verified pair-for-pair
    * against brute force in EditDistSpec. The equi-join on hashed
    * (l, i, substring) keys is therefore a complete candidate
    * generator; pairs of equal length are found from both orientations
    * and folded by the distinct.
    *
    * Short strings (l < k) have empty segments; both sides emit their
    * ("", l, i) keys, so such pairs degrade to per-length mini-blocks —
    * at l ≤ d every same-length pair is within distance d anyway (the
    * candidate set ≈ the true result set there, so nothing is wasted).
    * Hash collisions only ADD candidates; the banded verify removes
    * them. Per-row key count is O(d·(d+1)·(2d+1)) — independent of
    * string length, the property that lets d = 3+ scale where len^d
    * cannot.
    */
  private def passJoinCandidates(base: DataFrame, maxDist: Int): DataFrame = {
    val k = maxDist + 1
    val withLen = base.withColumn("len", length(col("str")))
    // (l DIV k) + extra for the first l%k segments; start is cumulative
    val idxKeys = withLen
      .select(col("id"), col("len").as("l"), col("str"),
        explode(sequence(lit(0), lit(maxDist))).as("i"))
      .select(col("id"),
        xxhash64(col("l"), col("i"),
          expr(s"substring(str, i * (l DIV $k) + least(i, l % $k) + 1, " +
            s"(l DIV $k) + IF(i < l % $k, 1, 0))")).as("hk"))
      .distinct()
    val probeKeys = withLen
      .select(col("id"), col("len").as("m"), col("str"),
        explode(sequence(greatest(col("len") - maxDist, lit(0)),
          col("len"))).as("l"))
      .select(col("id"), col("m"), col("l"), col("str"),
        explode(sequence(lit(0), lit(maxDist))).as("i"))
      .select(col("id"), col("m"), col("l"), col("i"), col("str"),
        expr(s"(l DIV $k) + IF(i < l % $k, 1, 0)").as("sl"),
        expr(s"i * (l DIV $k) + least(i, l % $k) + 1").as("p"))
      .select(col("id"), col("l"), col("i"),
        // Δ = m − l ∈ [0, d]; window shifts (d−Δ) DIV 2 left, (d+Δ) DIV 2
        // right of the segment's home position p
        explode(
          when(col("sl") === 0, array(lit("")))
            .when(
              greatest(col("p") - expr(s"($maxDist - (m - l)) DIV 2"),
                lit(1)) <=
                least(col("p") + expr(s"($maxDist + (m - l)) DIV 2"),
                  col("m") - col("sl") + 1),
              expr(s"transform(sequence(" +
                s"greatest(p - (($maxDist - (m - l)) DIV 2), 1), " +
                s"least(p + (($maxDist + (m - l)) DIV 2), m - sl + 1)), " +
                "q -> substring(str, q, sl))"))
            .otherwise(array().cast("array<string>"))).as("sub"))
      .select(col("id"),
        xxhash64(col("l"), col("i"), col("sub")).as("hk"))
      .distinct()
    probeKeys.select(col("id").as("pa"), col("hk"))
      .join(idxKeys.select(col("id").as("pb"), col("hk")), Seq("hk"))
      .filter(col("pa") =!= col("pb"))
      .select(least(col("pa"), col("pb")).as("a"),
        greatest(col("pa"), col("pb")).as("b"))
      .distinct()
  }

  val queries = Map(
    "join_salted_skew" -> (saltedSkewJoin _),
    "join_edit_distance" -> (editDistanceJoin _),
    "join_edit_distance3" -> (editDistance3Join _),
    "join_interval_overlap" -> (intervalOverlapJoin _),
    "join_3way_topk" -> (join3TopK _),
    "join_5way_star" -> (join5Star _),
    "join_left_outer" -> (leftOuterOrders _),
    "join_right_outer" -> (rightOuterOrders _),
    "join_full_outer" -> (fullOuter _),
    "join_semi" -> (semiJoin _),
    "join_anti" -> (antiJoin _),
    "join_cross" -> (crossJoinRegions _),
    "join_theta" -> (thetaJoinParts _),
    "join_range_bands" -> (rangeJoinBands _),
    "join_asof" -> (asofJoin _),
    "join_nearest" -> (nearestJoin _))

  val oracle = Map(
    "join_nearest" ->
      """WITH ev AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
             CASE WHEN event_type = 'purchase'
               THEN struct_pack(pts := CAST(ts AS TIMESTAMP),
                 pid := event_id) END AS p
           FROM events WHERE event_type IN ('click', 'purchase')),
         w AS (
           SELECT event_id, user_id, ts, event_type,
             last_value(p IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY ts, CASE WHEN p IS NULL THEN 1 ELSE 0 END, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
             first_value(p IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY ts, CASE WHEN p IS NULL THEN 1 ELSE 0 END, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
           FROM ev)
         SELECT event_id, user_id,
           CASE WHEN take_prev THEN prev.pid ELSE nxt.pid END
             AS nearest_pid,
           CASE WHEN take_prev THEN -d_prev ELSE d_next END AS delta_us
         FROM (
           SELECT event_id, user_id, prev, nxt,
             epoch_us(ts) - epoch_us(prev.pts) AS d_prev,
             epoch_us(nxt.pts) - epoch_us(ts) AS d_next,
             prev IS NOT NULL AND (nxt IS NULL
               OR epoch_us(ts) - epoch_us(prev.pts)
                 <= epoch_us(nxt.pts) - epoch_us(ts)) AS take_prev
           FROM w WHERE event_type = 'click')
         WHERE prev IS NOT NULL OR nxt IS NOT NULL
         ORDER BY event_id""",
    "join_edit_distance" ->
      // r14 replay-cost fix: the old all-pairs form ran levenshtein
      // TWICE over n²/2 pairs (142 s at sf0.1). This mirrors the
      // ENGINE's own FastSS candidate scheme (ed ≤ 1 ⟺ the two
      // deletion neighborhoods intersect — a candidate SUPERSET), then
      // the same exact levenshtein verify — output identical by the
      // prefilter-exactness argument, strict-checked at all three SFs.
      """WITH c AS (SELECT c_custkey AS id, c_name AS s FROM customer),
         keys AS (
           SELECT id, s, s AS k FROM c
           UNION ALL
           SELECT id, s, substr(s, 1, i - 1) || substr(s, i + 1) AS k
           FROM c, unnest(range(1, len(s) + 1)) AS t(i)),
         cand AS (SELECT DISTINCT a.id AS ia, a.s AS sa,
             b.id AS ib, b.s AS sb
           FROM keys a JOIN keys b ON a.k = b.k AND a.id < b.id)
         SELECT ia AS a, ib AS b,
           CAST(levenshtein(sa, sb) AS BIGINT) AS dist
         FROM cand
         WHERE levenshtein(sa, sb) <= 1
         ORDER BY a, b""",
    "join_edit_distance3" ->
      """SELECT a.s_suppkey AS a, b.s_suppkey AS b,
           CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
         FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
         WHERE levenshtein(a.s_name, b.s_name) <= 3
         ORDER BY a, b""",
    "join_interval_overlap" ->
      """WITH s1 AS (SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1020000000
               THEN 1 ELSE 0 END AS ns
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         s2 AS (SELECT user_id, us,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM s1),
         sess AS (SELECT user_id, sid, min(us) AS st, max(us) AS en
           FROM s2 GROUP BY user_id, sid)
         SELECT a.user_id AS ua, b.user_id AS ub,
           CAST(count(*) AS BIGINT) AS n_overlaps
         FROM sess a JOIN sess b
           ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
         GROUP BY ua, ub ORDER BY ua, ub""",
    "join_salted_skew" ->
      """SELECT s_suppkey, s_name, count(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_price
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_suppkey, s_name ORDER BY s_suppkey""",
    "join_3way_topk" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY o_orderkey, orderdate
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "join_5way_star" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey HAVING c_custkey <= 500 ORDER BY c_custkey""",
    "join_right_outer" ->
      """SELECT o_orderkey, c_custkey IS NOT NULL AS has_rich_customer,
         coalesce(c_acctbal, 0.0) AS acctbal
         FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
         RIGHT JOIN (SELECT * FROM orders WHERE o_orderkey <= 2000) o
           ON c_custkey = o_custkey
         ORDER BY o_orderkey""",
    "join_full_outer" ->
      """SELECT coalesce(e.k, c.k) AS k, e.k IS NOT NULL AS in_events,
         c.k IS NOT NULL AS in_customer
         FROM (SELECT DISTINCT user_id AS k FROM events) e
         FULL JOIN (SELECT DISTINCT c_custkey AS k FROM customer
                    WHERE c_acctbal > 5000) c ON e.k = c.k
         ORDER BY k""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                       AND o_orderstatus = 'P')
         ORDER BY c_custkey""",
    "join_anti" ->
      """SELECT c_custkey, c_nationkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_totalprice > 400000)
         ORDER BY c_custkey""",
    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",
    "join_theta" ->
      // histogram-weighted form (r14 scale fix) — same result as the
      // row-level pair join, strict-checked at all three SFs
      """WITH h AS (SELECT p_brand AS brand, p_size AS size,
             CAST(count(*) AS BIGINT) AS c
           FROM part GROUP BY 1, 2)
         SELECT a.brand, CAST(sum(a.c * b.c) AS BIGINT) AS n_pairs,
           max(b.size - a.size) AS max_gap
         FROM h a JOIN h b ON a.brand = b.brand AND a.size < b.size
         GROUP BY a.brand ORDER BY a.brand""",
    "join_range_bands" ->
      """SELECT band, count(*) AS n, min(value) AS min_v,
         max(value) AS max_v
         FROM events JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 120.0),
           ('high', 120.0, 1000000000.0)) AS bands(band, lo, hi)
           ON value >= lo AND value < hi
         GROUP BY band ORDER BY band""",
    "join_asof" ->
      """WITH u AS (
           SELECT event_id, user_id, ts,
             event_type,
             CASE WHEN event_type = 'purchase' THEN event_id END AS pid
           FROM events WHERE event_type IN ('click', 'purchase'))
         SELECT event_id, user_id, last_purchase_id FROM (
           SELECT event_id, user_id, event_type,
             last_value(pid IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, CASE WHEN pid IS NULL THEN 1 ELSE 0 END, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_id
           FROM u)
         WHERE event_type = 'click' ORDER BY event_id""")
}
