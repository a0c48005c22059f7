package graft.operators

import graft.{OpFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced filtering patterns (SURVEY.md §2.3 #18–19): the MRDP ch.3
  * "filtering with a Bloom filter" idiom and seeded random sampling.
  *
  * Scale notes: the Bloom pre-filter is the canonical way to shrink the big
  * side of a selective join before the shuffle — the sketch is built from
  * the small side (one pass, driver-merged), broadcast to every task, and
  * applied inside the scan pipeline; the exact join afterwards removes the
  * false positives, so results are exact while shuffle volume drops by the
  * filter's selectivity. (Spark can also do this automatically via
  * spark.sql.optimizer.runtime.bloomFilter.enabled — this operator is the
  * explicit, composable form.)
  */
object FilterOps extends OpFamily {

  /** Bloom-prefiltered semi join: lineitems of high-value orders. The Bloom
    * filter (built on the dimension side, broadcast) prunes the fact table
    * before the exact semi join; false positives are removed by the join,
    * so the output is exactly the semi join — which is what the oracle
    * checks.
    */
  def bloomSemiJoin(s: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
    // Distributed build: per-partition sketches merged by Spark's native
    // BloomFilterAggregate; ~958 kbit ≈ 0.01 fpp at 100k keys. The probe is
    // the codegen'd BloomFilterMightContain over the serialized filter as a
    // literal, so the lineitem scan pipeline stays one WholeStageCodegen
    // span (a Scala UDF here used to break codegen fusion).
    val bloomBytes = bigOrders
      .agg(graft.functions.NativeExprs
        .bloomAgg(s, col("o_orderkey"), 100000L, 958506L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    Tables.lineitem(s, d)
      .filter(graft.functions.NativeExprs.bloomMightContain(s,
        lit(bloomBytes), col("l_orderkey"))) // sketch prefilter (cheap)
      .join(bigOrders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi") // exact
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
      .orderBy(col("l_orderkey"))
  }

  /** Seeded Bernoulli sample — deterministic within Spark (fixed seed) but
    * not replayable in another engine, so registered rows-only; statistical
    * properties are asserted in scalatest.
    */
  def sampleSeeded(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .sample(withReplacement = false, fraction = 0.1, seed = 42)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** Deterministic 10% Bernoulli sample by multiplicative hash of the row
    * key — unlike [[sampleSeeded]] this replays identically in ANY engine
    * (oracle-checked), which is the property a repeatable 100 TB pipeline
    * actually wants from its sampling stage: re-runs, backfills, and
    * downstream joins all see the same sample.
    *
    * RESIDUE-CLASS ASSUMPTION (shared by every consumer of this hash —
    * [[sampleStratified]], [[mixTemperature]], [[splitAssign]],
    * [[graft.api.Graft.sampleByStratum]]): ((id % 1000)·761) % 1000 is a
    * BIJECTION on id mod 1000 (gcd(761, 1000) = 1), so selection is
    * exactly a residue-class filter — correct and unbiased when ids are
    * dense/sequential (this fixture's contract), but an id-assignment
    * pattern with period dividing 1000 (e.g. ids striped by shard or
    * source) would bias rates and split balance. For corpora with
    * structured ids swap in an avalanche hash (xxhash64(id) % 1000) —
    * same one-line filter shape; forfeits only the DuckDB oracle replay,
    * since the multiplicative form is what both engines can evaluate
    * bit-identically.
    */
  def sampleHash(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      // operands are reduced mod 1000 BEFORE multiplying so the product can
      // never overflow int64 — (a*b) mod m == ((a mod m)*(b mod m)) mod m,
      // so the selected sample is identical, but the arithmetic stays exact
      // at any orderkey magnitude (Spark would silently wrap, DuckDB would
      // raise; both now agree at any scale factor).
      .filter(pmod(pmod(col("l_orderkey"), lit(1000)) * lit(761L) +
        pmod(col("l_linenumber"), lit(1000)) * lit(503L), lit(1000)) < 100)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
      .orderBy(col("l_returnflag"))

  /** Stratified deterministic sampling — the data-MIXING step of a training
    * pipeline: each stratum (language) gets its own keep-rate (down-sample
    * the over-represented head, keep the tail), decided by the same
    * wrap-safe multiplicative hash as [[sampleHash]], so the mix is
    * replayable in any engine and stable across re-runs/backfills. The
    * per-stratum rate lookup is a broadcast map literal — no join, no
    * shuffle before the final bounded aggregate.
    */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    // keep-rate per 1000 by language: halve English, keep minority langs
    val rates: Map[String, Long] = Map("en" -> 500L, "es" -> 800L)
    val rate = coalesce(element_at(typedLit(rates), col("lang")), lit(1000L))
    Tables.documents(s, d)
      .filter(pmod(pmod(col("doc_id"), lit(1000)) * lit(761L), lit(1000))
        < rate)
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), " ")).as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"),
        sum(col("n_chars")).cast("bigint").as("n_chars"))
      .orderBy(col("lang"))
  }

  /** The hand-set per-lang target token shares (per-mille, sum 1000)
    * the REWEIGHTING report drives toward — the registered stand-in for
    * a rollout's mixing config (en-heavy with a deliberate zh up-weight,
    * so the fixture exercises both down- and up-weighting vs the raw
    * corpus mix).
    */
  private[graft] val MixTargets: Seq[(String, Long)] =
    Seq(("de", 150L), ("en", 400L), ("es", 150L), ("fr", 100L),
      ("zh", 200L))

  /** TARGET-SHARE REWEIGHTING REPORT — the mixing step every
    * pretraining rollout tunes: given per-stratum target TOKEN shares
    * (per-mille), emit each stratum's sampling rate and the achieved
    * mix. The budget is the largest token mass servable WITHOUT
    * upsampling: B = min_s ⌊1000·t_s / share_s⌋ (the binding stratum
    * samples at ~1000‰); wanted_s = ⌊B·share_s/1000⌋; rate_s =
    * min(1000, ⌊1000·wanted_s/t_s⌋), applied as the usual wrap-safe
    * multiplicative residue-class filter so the mix replays identically
    * in any engine and across backfills. achieved_permille is the
    * realized share of kept tokens — the report's check column: it
    * lands within one document of target for unstructured ids (the
    * [[sampleHash]] residue-class caveat applies).
    *
    * Exactness: every derivation is integer floor-division, run in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) because 1000·t·share
    * passes 2⁶³ at real corpus scale (10¹⁴ tokens); the oracle replays
    * bit-for-bit. Strata missing from the target map are DROPPED
    * (inner join) — a rollout config names every source it ships.
    *
    * Scale shape: one bounded groupBy → 5-row rate table broadcast
    * back; two corpus scans, zero wide shuffles of the corpus.
    */
  def mixReweight(s: SparkSession, d: String): DataFrame =
    mixReweightOn(Tables.documents(s, d), "doc_id", "text", "lang",
      MixTargets)

  /** The generic core behind [[mixReweight]] and
    * [[graft.api.Graft.mixTargetReport]]: any frame, numeric-unique
    * `idCol` (residue-class caveat), whitespace `textCol` tokens,
    * string `stratumCol`, `targets` = (stratum, share-per-mille).
    */
  private[graft] def mixReweightOn(df: DataFrame, idCol: String,
      textCol: String, stratumCol: String,
      targets: Seq[(String, Long)]): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      s"target shares must be positive per-mille values: $targets")
    val s = df.sparkSession
    import s.implicits._
    val tdf = broadcast(targets.toDF("lang", "target_permille"))
    val docs = df.select(col(idCol).as("doc_id"),
      col(stratumCol).cast("string").as("lang"),
      size(split(col(textCol), " ")).cast("long").as("tok"))
    val per = docs.groupBy(col("lang")).agg(sum(col("tok")).as("t"))
      .join(tdf, Seq("lang"))
    val budget = per.agg(
      min(expr("(CAST(t AS DECIMAL(38,0)) * 1000) DIV target_permille"))
        .as("b"))
    val rates = per.crossJoin(broadcast(budget))
      .withColumn("wanted_tokens", expr(
        "CAST((CAST(b AS DECIMAL(38,0)) * target_permille) DIV 1000 AS BIGINT)"))
      .withColumn("rate", least(lit(1000L), expr(
        "CAST((CAST(wanted_tokens AS DECIMAL(38,0)) * 1000) DIV t AS BIGINT)")))
      .select(col("lang"), col("t"), col("target_permille"),
        col("wanted_tokens"), col("rate"))
      .localCheckpoint() // 1 row per stratum; read by the filter AND the
                         // report join — avoids re-scanning the corpus
    val kept = docs
      .join(broadcast(rates.select(col("lang"), col("rate"))), Seq("lang"))
      .filter(pmod(pmod(col("doc_id"), lit(1000)) * lit(761L), lit(1000)) <
        col("rate"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("tok")).as("kept_tokens"))
      .localCheckpoint() // stratum-sized; read by the total AND the join
    val tot = kept.agg(
      coalesce(sum(col("kept_tokens")), lit(0L)).as("tot_kept"))
    rates.join(kept, Seq("lang"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("t").as("total_tokens"),
        col("target_permille"), col("wanted_tokens"), col("rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        when(col("tot_kept") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "coalesce(kept_tokens, 0L) * 1000 DIV tot_kept"))
          .as("achieved_permille"))
      .orderBy(col("lang"))
  }

  /** DATA-CONSTRAINED BUDGET PLANNER — the question AFTER the mix is
    * chosen (Muennighoff et al., "Scaling Data-Constrained Language
    * Models", NeurIPS'23, public, motivates the repeat cap): given a
    * total training-token budget, per-stratum target shares, and a
    * maximum repeat factor per stratum (capPermille, e.g. 1500 = see
    * each source at most 1.5 epochs), how many tokens does each source
    * actually contribute? Proportional allocation would overdraw small
    * sources, so the planner WATER-FILLS: each round allocates the
    * remaining budget proportionally among uncapped strata, caps any
    * stratum whose proposal exceeds tokens·cap, and redistributes the
    * excess next round. Converges in ≤ #strata rounds (each round caps
    * ≥ 1 stratum or reaches fixpoint). All integer floor division in
    * DECIMAL(38,0)/HUGEINT — the oracle replays the rounds exactly.
    *
    * Output per stratum: tokens, target share, cap, allocated tokens,
    * epochs_permille (1000 = one full pass; < 1000 = subsample), and
    * whether the cap bound. At sf0.1 with budget = 1.5× corpus and
    * cap 1500‰ the fixture cascades: zh+de cap in round 1, en+es in
    * round 2, fr in round 3 — the 5-stratum worst case, measured.
    *
    * Scale shape: one bounded groupBy → a #strata-row frame; every
    * round is one broadcast aggregate over that frame — corpus scanned
    * ONCE regardless of rounds.
    */
  def budgetPlan(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // one metadata-cheap aggregate action (the scaledNlist precedent):
    // the budget knob is derived from the corpus so the planner's
    // dynamics are scale-free across fixture SFs
    val total = docs
      .agg(sum(size(split(col("text"), " ")).cast("long"))).first().getLong(0)
    budgetPlanOn(docs, "text", "lang", MixTargets,
      budget = total * 3 / 2, capPermille = 1500, rounds = 3)
  }

  /** The water-filling core — also [[graft.api.Graft.budgetPlan]]'s.
    * `targets` = (stratum, share-per-mille); strata missing from the
    * map are dropped (inner join — a rollout config names every source
    * it ships, the [[mixReweightOn]] contract).
    */
  private[graft] def budgetPlanOn(df: DataFrame, textCol: String,
      stratumCol: String, targets: Seq[(String, Long)], budget: Long,
      capPermille: Int, rounds: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(capPermille > 0, s"capPermille must be positive: $capPermille")
    require(rounds > 0, s"rounds must be positive: $rounds")
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      s"target shares must be positive per-mille values: $targets")
    val s = df.sparkSession
    import s.implicits._
    val tdf = broadcast(targets.toDF("stratum", "target_permille"))
    var cur = df.select(col(stratumCol).cast("string").as("stratum"),
        size(split(col(textCol), " ")).cast("long").as("tok"))
      .groupBy(col("stratum")).agg(sum(col("tok")).as("tokens"))
      .join(tdf, Seq("stratum"))
      .withColumn("cap_tokens", expr(s"CAST((CAST(tokens AS " +
        s"DECIMAL(38,0)) * $capPermille) DIV 1000 AS BIGINT)"))
      .withColumn("capped", lit(false))
      .withColumn("alloc_tokens", lit(0L))
      .localCheckpoint() // #strata rows; re-read every round
    (1 to rounds).foreach { _ =>
      val agg = cur.agg(
        coalesce(sum(when(col("capped"), col("cap_tokens"))), lit(0L))
          .as("used_b"),
        coalesce(sum(when(!col("capped"), col("target_permille"))),
          lit(0L)).as("wr"))
      cur = cur.crossJoin(broadcast(agg))
        .withColumn("prop", when(col("capped"), col("cap_tokens"))
          .otherwise(expr(s"CAST((CAST(GREATEST($budget - used_b, 0) AS " +
            "DECIMAL(38,0)) * target_permille) DIV wr AS BIGINT)")))
        .withColumn("capped",
          col("capped") || col("prop") > col("cap_tokens"))
        .withColumn("alloc_tokens",
          when(col("capped"), least(col("prop"), col("cap_tokens")))
            .otherwise(col("prop")))
        .drop("used_b", "wr", "prop")
        .localCheckpoint()
    }
    cur.select(col("stratum"), col("tokens"), col("target_permille"),
        col("cap_tokens"), col("alloc_tokens"),
        expr("CAST((CAST(alloc_tokens AS DECIMAL(38,0)) * 1000) DIV " +
          "tokens AS BIGINT)").as("epochs_permille"),
        col("capped").cast("int").as("capped"))
      .orderBy(col("stratum"))
  }

  /** TEMPERATURE-based source mixing (α = 0.5) — the step a training-data
    * pipeline runs after dedup to rebalance languages/sources: where
    * [[sampleStratified]] applies HAND-PICKED rates, here the per-stratum
    * keep-rate is DERIVED from the data — rate_l = ⌊1000·√(n_min/n_l)⌋ per
    * mille, i.e. sampling probability ∝ n^(α−1) so the kept corpus mass
    * follows n^α: the head language is damped toward the tail, the rarest
    * language keeps 100%. Selection reuses the wrap-safe multiplicative
    * hash, so the mix replays identically in any engine and across
    * re-runs/backfills.
    *
    * Float-parity note: √ and ÷ are IEEE-754 correctly-rounded, so the
    * double `1000·√(n_min/n)` is bit-identical in Spark and DuckDB and the
    * ⌊·⌋ boundary cannot disagree.
    *
    * Scale shape: the rate table is one groupBy over a bounded stratum
    * column joined back with an explicit broadcast — counts→rates→filter→
    * stats in two scans of the corpus and zero wide shuffles of it.
    */
  def mixTemperature(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val nmin = counts.agg(min(col("n")).as("nmin"))
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col("lang"),
        floor(lit(1000.0) * sqrt(col("nmin").cast("double") / col("n")))
          .cast("long").as("rate"))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(pmod(pmod(col("doc_id"), lit(1000)) * lit(761L), lit(1000)) <
        col("rate"))
      .groupBy(col("lang"), col("rate"))
      .agg(count(lit(1)).as("n_kept"),
        sum(size(split(col("text"), " "))).cast("bigint").as("n_tokens"))
      .orderBy(col("lang"))
  }

  /** TOKEN-BUDGET temperature mixing — [[mixTemperature]] rebalances by
    * DOCUMENT counts, but training runs are provisioned in TOKENS: given
    * a global budget B = ¼ of the corpus token mass, each language gets
    * target_l = B·√t_l / Σ√t (mass ∝ t^α, α = ½ — the multilingual
    * mixing rule), realized as a deterministic per-mille keep-rate
    * min(1000, ⌊1000·target_l/t_l⌋) over the same wrap-safe hash.
    *
    * Engine parity by integral arithmetic: √t is floored to a LONG per
    * stratum before the Σ (sums of longs are order-independent where
    * sums of √-doubles are not), and the target/rate divisions run as
    * exact integer floor-division in DECIMAL(38,0) on the Spark side and
    * HUGEINT in DuckDB — the BIGINT intermediate 1000·B·√t would
    * overflow at real corpus scale (10¹⁴ tokens · 10⁷ ≈ 10²¹), the
    * 128-bit forms never do. Achieved kept_tokens lands within one
    * doc of target for uniform ids ([[sampleHash]]'s residue-class
    * caveat applies to structured ids).
    *
    * Scale shape: rate table = one bounded groupBy + broadcast back;
    * two corpus scans, zero wide shuffles of the corpus.
    */
  def mixTokenBudget(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("tok"))
    val perLang = docs.groupBy(col("lang"))
      .agg(sum(col("tok")).as("t"),
        floor(sqrt(sum(col("tok")).cast("double"))).cast("long").as("sq"))
    val tot = perLang.agg(sum(col("t")).as("tt"), sum(col("sq")).as("ss"))
    val rates = perLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("t"),
        expr("""CAST((CAST(tt AS DECIMAL(38,0)) * sq)
                 DIV (CAST(4 AS DECIMAL(38,0)) * ss) AS BIGINT)""")
          .as("target_tok"))
      .select(col("lang"), col("t"), col("target_tok"),
        least(lit(1000L),
          expr("""CAST((CAST(1000 AS DECIMAL(38,0)) * target_tok)
                   DIV CAST(t AS DECIMAL(38,0)) AS BIGINT)"""))
          .as("rate"))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(pmod(pmod(col("doc_id"), lit(1000)) * lit(761L), lit(1000)) <
        col("rate"))
      .groupBy(col("lang"), col("t"), col("target_tok"), col("rate"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("tok")).as("kept_tokens"))
      .select(col("lang"), col("t").as("total_tokens"), col("target_tok"),
        col("rate"), col("n_kept"), col("kept_tokens"))
      .orderBy(col("lang"))
  }

  /** Deterministic train/val/test split (80/10/10) by the wrap-safe
    * multiplicative hash — the assignment step every training pipeline
    * runs last: splits are DISJOINT and EXHAUSTIVE by construction (one
    * hash, three bands), stable across re-runs/backfills/engines, and a
    * document never migrates between splits when the corpus grows (the
    * hash depends only on doc_id). Reports per-split doc/token mass and
    * the per-lang spread as the split-balance check.
    */
  def splitAssign(s: SparkSession, d: String): DataFrame = {
    val h = pmod(pmod(col("doc_id"), lit(1000)) * lit(761L), lit(1000))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        when(h < 800, lit("train")).when(h < 900, lit("val"))
          .otherwise(lit("test")).as("split"),
        size(split(col("text"), " ")).as("n_tokens"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("split"))
  }

  /** Weighted sampling without replacement — Efraimidis-Spirakis A-Res
    * (Inf. Proc. Letters 97(5), 2006, public) with the wrap-safe
    * multiplicative hash standing in for the uniform draw, so the sample
    * is DETERMINISTIC and engine-replayable: key = u^(1/w), keep the
    * top-k keys. Weight = n_chars, i.e. long documents are
    * proportionally more likely to be kept — the "sample by quality
    * score" step of a corpus pipeline, exact and backfill-stable where
    * rand()-based samplers are neither. Scale shape: one narrow map to
    * compute the key, then TakeOrderedAndProject (per-partition top-k +
    * driver merge of k·partitions rows — never a global sort). The
    * rank-100 boundary gap is ≥2.5e-8 at every fixture SF, seven orders
    * above pow()'s cross-engine ulp drift, so membership cannot flip.
    * Same RESIDUE-CLASS ASSUMPTION as [[sampleHash]] (documented there):
    * structured ids with period | 1000 would need the xxhash64 swap.
    */
  /** The A-Res key: u^(1/w) with the deterministic multiplicative-hash
    * uniform, weight = n_chars. Shared by the global and per-group
    * weighted samplers.
    */
  private def aresKey =
    pow((pmod(pmod(col("doc_id"), lit(1000)) * lit(761L), lit(1000))
        .cast("double") + lit(0.5)) / lit(1000.0),
      lit(1.0) / col("n_chars"))

  def sampleWeighted(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("wkey", aresKey)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("wkey"))
      .orderBy(desc("wkey"), col("doc_id"))
      .limit(100)

  /** Per-stratum A-Res: the SAME weighted-reservoir key, top-5 per
    * language — weighted sampling with per-group quotas (the corpus-mix
    * step when each language must contribute a fixed-size, quality-
    * weighted sample). One window pass; Spark prunes it to a
    * WindowGroupLimit, so each partition keeps only k rows per group
    * past the sort — never a global top-k of the whole corpus.
    */
  def sampleWeightedGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(desc("wkey"), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("wkey", aresKey)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"),
        col("wkey"))
      .orderBy(col("lang"), col("rn"))
  }

  val queries = Map(
    "filter_sample_weighted" -> (sampleWeighted _),
    "filter_sample_weighted_group" -> (sampleWeightedGroup _),
    "filter_bloom_semi_join" -> (bloomSemiJoin _),
    "filter_mix_temperature" -> (mixTemperature _),
    "filter_mix_token_budget" -> (mixTokenBudget _),
    "filter_mix_reweight" -> (mixReweight _),
    "filter_budget_plan" -> (budgetPlan _),
    "filter_split_assign" -> (splitAssign _),
    "filter_sample_seeded" -> (sampleSeeded _),
    "filter_sample_stratified" -> (sampleStratified _),
    "filter_sample_hash" -> (sampleHash _))

  val oracle = Map(
    "filter_sample_weighted_group" ->
      """SELECT lang, rn, doc_id, n_chars, wkey FROM (
           SELECT lang, doc_id, n_chars, wkey,
             row_number() OVER (PARTITION BY lang
               ORDER BY wkey DESC, doc_id) AS rn
           FROM (SELECT doc_id, lang, n_chars,
                   pow((doc_id % 1000 * 761 % 1000 + 0.5) / 1000.0,
                     1.0 / n_chars) AS wkey
                 FROM documents))
         WHERE rn <= 5 ORDER BY lang, rn""",
    "filter_sample_weighted" ->
      """SELECT doc_id, lang, n_chars,
           pow((doc_id % 1000 * 761 % 1000 + 0.5) / 1000.0,
             1.0 / n_chars) AS wkey
         FROM documents
         ORDER BY wkey DESC, doc_id LIMIT 100""",
    "filter_mix_temperature" ->
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents
             GROUP BY lang),
         mn AS (SELECT min(n) AS nmin FROM counts),
         rates AS (SELECT lang,
             CAST(FLOOR(1000.0 * SQRT(CAST(nmin AS DOUBLE) / n)) AS BIGINT)
               AS rate
           FROM counts CROSS JOIN mn)
         SELECT d.lang, r.rate, count(*) AS n_kept,
           CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens
         FROM documents d JOIN rates r USING (lang)
         WHERE ((d.doc_id % 1000) * 761) % 1000 < r.rate
         GROUP BY d.lang, r.rate ORDER BY d.lang""",
    "filter_budget_plan" -> {
      // one water-filling round: rN from r(N-1) through the aN totals —
      // mirror of the engine loop term for term
      def round(n: Int): String = {
        val p = n - 1
        s"""a$n AS (SELECT
             coalesce(SUM(CASE WHEN capped THEN cap END), 0) AS used_b,
             coalesce(SUM(CASE WHEN NOT capped THEN share END), 0) AS wr
           FROM r$p),
         r$n AS (SELECT lang, tokens, share, cap,
             capped OR prop > cap AS capped,
             CASE WHEN capped OR prop > cap THEN least(prop, cap)
                  ELSE prop END AS alloc
           FROM (SELECT r$p.lang, r$p.tokens, r$p.share, r$p.cap,
               r$p.capped,
               CASE WHEN r$p.capped THEN r$p.cap
                 ELSE CAST(CAST(greatest((SELECT budget FROM b) - used_b,
                   0) AS HUGEINT) * r$p.share // wr AS BIGINT) END AS prop
             FROM r$p, a$n))"""
      }
      s"""WITH toks AS (SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
           FROM documents),
         b AS (SELECT CAST(SUM(tok) AS BIGINT) * 3 // 2 AS budget
           FROM toks),
         targets(lang, share) AS (VALUES
           ${MixTargets.map { case (l, p) =>
             s"('$l', CAST($p AS BIGINT))" }.mkString(",\n           ")}),
         r0 AS (SELECT t.lang, CAST(SUM(t.tok) AS BIGINT) AS tokens,
             g.share,
             CAST(CAST(SUM(t.tok) AS HUGEINT) * 1500 // 1000 AS BIGINT)
               AS cap,
             false AS capped, CAST(0 AS BIGINT) AS alloc
           FROM toks t JOIN targets g USING (lang)
           GROUP BY t.lang, g.share),
         ${(1 to 3).map(round).mkString(",\n         ")}
         SELECT lang AS stratum, tokens, share AS target_permille,
           cap AS cap_tokens, alloc AS alloc_tokens,
           CAST(CAST(alloc AS HUGEINT) * 1000 // tokens AS BIGINT)
             AS epochs_permille,
           CAST(capped AS INT) AS capped
         FROM r3 ORDER BY stratum"""
    },
    "filter_mix_reweight" ->
      s"""WITH toks AS (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
           FROM documents),
         targets(lang, target_permille) AS (VALUES
           ${MixTargets.map { case (l, p) =>
             s"('$l', CAST($p AS BIGINT))" }.mkString(",\n           ")}),
         per AS (SELECT t.lang, CAST(SUM(t.tok) AS BIGINT) AS t,
             g.target_permille
           FROM toks t JOIN targets g USING (lang)
           GROUP BY t.lang, g.target_permille),
         b AS (SELECT MIN(CAST(t AS HUGEINT) * 1000 // target_permille)
             AS b FROM per),
         rated AS (SELECT lang, t, target_permille, wanted_tokens,
             least(1000, CAST(CAST(wanted_tokens AS HUGEINT) * 1000
               // CAST(t AS HUGEINT) AS BIGINT)) AS rate
           FROM (SELECT lang, t, target_permille,
                   CAST((SELECT b FROM b) * target_permille // 1000
                     AS BIGINT) AS wanted_tokens
                 FROM per)),
         kept AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(SUM(d.tok) AS BIGINT) AS kept_tokens
           FROM toks d JOIN rated r USING (lang)
           WHERE ((d.doc_id % 1000) * 761) % 1000 < r.rate
           GROUP BY d.lang),
         tot AS (SELECT CAST(coalesce(SUM(kept_tokens), 0) AS BIGINT)
             AS tot_kept FROM kept)
         SELECT r.lang, r.t AS total_tokens, r.target_permille,
           r.wanted_tokens, r.rate,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           CASE WHEN t.tot_kept = 0 THEN NULL
             ELSE CAST(coalesce(k.kept_tokens, 0) AS BIGINT) * 1000
               // t.tot_kept END AS achieved_permille
         FROM rated r LEFT JOIN kept k USING (lang) CROSS JOIN tot t
         ORDER BY r.lang""",
    "filter_mix_token_budget" ->
      """WITH toks AS (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
           FROM documents),
         per AS (SELECT lang, CAST(SUM(tok) AS BIGINT) AS t,
             CAST(FLOOR(SQRT(CAST(SUM(tok) AS DOUBLE))) AS BIGINT) AS sq
           FROM toks GROUP BY lang),
         tot AS (SELECT CAST(SUM(t) AS BIGINT) AS tt,
             CAST(SUM(sq) AS BIGINT) AS ss FROM per),
         rates AS (SELECT lang, t,
             CAST((CAST(tt AS HUGEINT) * sq)
               // (CAST(4 AS HUGEINT) * ss) AS BIGINT) AS target_tok
           FROM per CROSS JOIN tot),
         rated AS (SELECT lang, t, target_tok,
             least(1000, CAST((CAST(1000 AS HUGEINT) * target_tok)
               // CAST(t AS HUGEINT) AS BIGINT)) AS rate
           FROM rates)
         SELECT d.lang, r.t AS total_tokens, r.target_tok, r.rate,
           count(*) AS n_kept,
           CAST(SUM(d.tok) AS BIGINT) AS kept_tokens
         FROM toks d JOIN rated r USING (lang)
         WHERE ((d.doc_id % 1000) * 761) % 1000 < r.rate
         GROUP BY d.lang, r.t, r.target_tok, r.rate ORDER BY d.lang""",
    "filter_split_assign" ->
      """SELECT CASE WHEN ((doc_id % 1000) * 761) % 1000 < 800 THEN 'train'
                WHEN ((doc_id % 1000) * 761) % 1000 < 900 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         FROM documents GROUP BY split ORDER BY split""",
    "filter_bloom_semi_join" ->
      """SELECT l_orderkey, count(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_orderkey = l_orderkey
                         AND o_totalprice > 300000)
         GROUP BY l_orderkey ORDER BY l_orderkey""",
    "filter_sample_stratified" ->
      """SELECT lang, count(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
         FROM documents
         WHERE ((doc_id % 1000) * 761) % 1000 <
           (CASE lang WHEN 'en' THEN 500 WHEN 'es' THEN 800 ELSE 1000 END)
         GROUP BY lang ORDER BY lang""",
    "filter_sample_hash" ->
      """SELECT l_returnflag, count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE ((l_orderkey % 1000) * 761 + (l_linenumber % 1000) * 503)
               % 1000 < 100
         GROUP BY l_returnflag ORDER BY l_returnflag""")
}
