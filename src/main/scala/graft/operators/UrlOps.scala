package graft.operators

import graft.{OpFamily, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL / domain analytics — the web-crawl half of an LLM data pipeline
  * (Common-Crawl-style corpora key nearly everything on the URL: per-domain
  * quality rollups, registrable-domain grouping, URL-normalized dedup,
  * tracking-param hygiene). The fixture tables carry no URL column, so a
  * deterministic pseudo-URL is DERIVED from documents (doc_id/lang —
  * spelled identically in the DuckDB oracle); the OPERATORS are generic
  * over any URL string column and exercised on real-world malformations in
  * UrlOpsSpec (no scheme, empty query, bare host, uppercase, ports).
  *
  * Derivation shape: docs in groups of 4 (g = doc_id DIV 4) share one
  * logical page; the four members vary exactly by what normalization
  * strips — host case, default port, trailing slash, utm_* params, param
  * order, fragment — so url_dedup_normalized provably merges 4:1 (modulo
  * the g%7 groups that carry a REAL :8080 port for every member, which
  * normalization must NOT strip).
  *
  * Scale shape: parsing and normalization are pure codegen'd Column
  * expressions (regexp_extract / split / array ops — zero UDFs) applied
  * map-side; every rollup is one hash aggregate with map-side partials;
  * the dedup is a distinct on the normalized key — at 100 TB each query
  * is a scan plus one shuffle on the (bounded-cardinality) domain key.
  */
object UrlOps extends OpFamily {

  // ---- derived fixture URL (documents has no URL column) ----------------

  private def withUrl(s: SparkSession, d: String): DataFrame = {
    val g = expr("doc_id div 4") // group id; doc_id non-negative
    val r = col("doc_id") % 4
    val hostcore =
      when(g % 3 === 0, concat(lit("www.src"), g % 20, lit(".com")))
        .when(g % 3 === 1, concat(lit("src"), g % 20, lit(".co.uk")))
        .otherwise(concat(lit("cdn.src"), g % 20, lit(".org")))
    val scheme = when(g % 2 === 0, lit("https")).otherwise(lit("http"))
    val ref = concat(lit("ref=r"), g % 4) // kept param, order varies by r
    val idp = concat(lit("id="), g)
    val hasRef = g % 5 === 0
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"), col("n_chars"),
      concat(
        scheme, lit("://"),
        when(r === 3, upper(hostcore)).otherwise(hostcore),
        when(g % 7 === 0, lit(":8080")) // real port: every group member
          .when(r === 1, when(g % 2 === 0, lit(":443")).otherwise(lit(":80")))
          .otherwise(lit("")),
        lit("/p"), g % 10, lit("/doc/"), g,
        when(r === 2, lit("/")).otherwise(lit("")),
        when(r === 0, concat(lit("?utm_source=feed"),
          when(hasRef, concat(lit("&"), ref)).otherwise(lit("")),
          lit("&"), idp, lit("&utm_campaign=c"), g % 3))
          .when(r === 1, concat(lit("?"), idp,
            when(hasRef, concat(lit("&"), ref)).otherwise(lit(""))))
          .when(r === 2, concat(lit("?"),
            when(hasRef, concat(ref, lit("&"))).otherwise(lit("")),
            idp, lit("&utm_medium=rss")))
          .otherwise(concat(lit("?utm_lang="), col("lang"), lit("&"), idp,
            when(hasRef, concat(lit("&"), ref)).otherwise(lit("")))),
        when(r === 0, lit("#top")).otherwise(lit(""))
      ).as("url"))
  }

  /** The same derivation as a DuckDB CTE over documents. */
  private val urlCte: String =
    """u AS (SELECT doc_id, lang, n_chars,
         (CASE WHEN g % 2 = 0 THEN 'https' ELSE 'http' END) || '://' ||
         (CASE WHEN r = 3 THEN upper(hostcore) ELSE hostcore END) ||
         (CASE WHEN g % 7 = 0 THEN ':8080'
               WHEN r = 1 THEN
                 (CASE WHEN g % 2 = 0 THEN ':443' ELSE ':80' END)
               ELSE '' END) ||
         '/p' || (g % 10) || '/doc/' || g ||
         (CASE WHEN r = 2 THEN '/' ELSE '' END) ||
         (CASE WHEN r = 0 THEN '?utm_source=feed' ||
                 (CASE WHEN hasref THEN '&' || ref ELSE '' END) ||
                 '&' || idp || '&utm_campaign=c' || (g % 3)
               WHEN r = 1 THEN '?' || idp ||
                 (CASE WHEN hasref THEN '&' || ref ELSE '' END)
               WHEN r = 2 THEN '?' ||
                 (CASE WHEN hasref THEN ref || '&' ELSE '' END) ||
                 idp || '&utm_medium=rss'
               ELSE '?utm_lang=' || lang || '&' || idp ||
                 (CASE WHEN hasref THEN '&' || ref ELSE '' END) END) ||
         (CASE WHEN r = 0 THEN '#top' ELSE '' END) AS url
       FROM (SELECT doc_id, lang, n_chars, doc_id // 4 AS g, doc_id % 4 AS r,
               'ref=r' || ((doc_id // 4) % 4) AS ref,
               'id=' || (doc_id // 4) AS idp,
               (doc_id // 4) % 5 = 0 AS hasref,
               (CASE WHEN (doc_id // 4) % 3 = 0
                       THEN 'www.src' || ((doc_id // 4) % 20) || '.com'
                     WHEN (doc_id // 4) % 3 = 1
                       THEN 'src' || ((doc_id // 4) % 20) || '.co.uk'
                     ELSE 'cdn.src' || ((doc_id // 4) % 20) || '.org'
                 END) AS hostcore
             FROM documents))"""

  // ---- the generic operators (any URL string column) --------------------

  /** Parsed components of a URL column — pure regexp_extract Columns, all
    * total (no match → empty string, the regexp_extract convention in BOTH
    * engines). Scheme-less strings parse as all-empty components rather
    * than throwing, the property a crawl-scale parse stage needs.
    */
  private[graft] def urlScheme(u: Column): Column =
    regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
  private[graft] def urlHostPort(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
  private[graft] def urlHost(u: Column): Column =
    lower(regexp_extract(urlHostPort(u), "^([^:]*)", 1))
  private[graft] def urlPortStr(u: Column): Column =
    regexp_extract(urlHostPort(u), ":([0-9]+)$", 1)
  private[graft] def urlPath(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
  private[graft] def urlQuery(u: Column): Column =
    regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)
  private[graft] def urlFragment(u: Column): Column =
    regexp_extract(u, "#(.*)$", 1)

  /** Registrable domain (eTLD+1) of a lowercased host: last two labels,
    * or last three under a multi-label public suffix (the bounded suffix
    * list here is just co.uk — a real deployment broadcasts the public
    * suffix list and the expression shape is identical).
    */
  private[graft] def registrableDomain(hostL: Column): Column = {
    val ls = split(hostL, "\\.")
    // single-label hosts (localhost, empty from a scheme-less parse) pass
    // through — element_at is 1-based and would otherwise throw on index 0
    when(size(ls) < 2, hostL)
      .when(hostL.endsWith(".co.uk"),
        concat(element_at(ls, size(ls) - 2), lit(".co.uk")))
      .otherwise(concat(element_at(ls, size(ls) - 1), lit("."),
        element_at(ls, size(ls))))
  }

  /** Canonical form for URL-keyed dedup: lowercase host, strip the
    * scheme's DEFAULT port only (443 for https, 80 for http — a real
    * :8080 survives), strip trailing slashes from a non-root path, drop
    * utm_* tracking params, sort the surviving params (param ORDER is not
    * page identity), drop the fragment.
    */
  private[graft] def normalizedUrl(u: Column): Column = {
    val sch = lower(urlScheme(u)) // scheme is case-insensitive (RFC 3986)
    val host = urlHost(u)
    val ps = urlPortStr(u)
    val portN = when(ps === "", lit(""))
      .when(sch === "https" && ps === "443", lit(""))
      .when(sch === "http" && ps === "80", lit(""))
      .otherwise(concat(lit(":"), ps))
    val pathN = {
      val p = regexp_replace(urlPath(u), "/+$", "")
      when(p === "", lit("/")).otherwise(p)
    }
    val params = array_join(array_sort(filter(split(urlQuery(u), "&"),
      x => (length(x) > 0) && (substring(x, 1, 4) =!= "utm_"))), "&")
    concat(sch, lit("://"), host, portN, pathN,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  /** The same normalization spelled in DuckDB over a column expression. */
  private def normSql(u: String): String =
    s"""(lower(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
       lower(regexp_extract(regexp_extract($u,
         '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^([^:]*)', 1)) ||
       (CASE WHEN regexp_extract(regexp_extract($u,
              '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
              ':([0-9]+)$$', 1) = '' THEN ''
          WHEN lower(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
              = 'https' AND regexp_extract(regexp_extract($u,
              '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
              ':([0-9]+)$$', 1) = '443' THEN ''
          WHEN lower(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
              = 'http' AND regexp_extract(regexp_extract($u,
              '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
              ':([0-9]+)$$', 1) = '80' THEN ''
          ELSE ':' || regexp_extract(regexp_extract($u,
              '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
              ':([0-9]+)$$', 1) END) ||
       (CASE WHEN regexp_replace(regexp_extract($u,
              '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
              '/+$$', '') = '' THEN '/'
          ELSE regexp_replace(regexp_extract($u,
              '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
              '/+$$', '') END) ||
       (CASE WHEN array_to_string(list_sort(list_filter(
              string_split(regexp_extract($u, '^[^#?]*\\?([^#]*)', 1), '&'),
              x -> len(x) > 0 AND substring(x, 1, 4) <> 'utm_')), '&') = ''
          THEN ''
          ELSE '?' || array_to_string(list_sort(list_filter(
              string_split(regexp_extract($u, '^[^#?]*\\?([^#]*)', 1), '&'),
              x -> len(x) > 0 AND substring(x, 1, 4) <> 'utm_')), '&')
        END))"""

  private def regdomSql(hostL: String): String =
    s"""(CASE WHEN ends_with($hostL, '.co.uk')
           THEN string_split($hostL, '.')[len(string_split($hostL, '.')) - 2]
             || '.co.uk'
           ELSE string_split($hostL, '.')[len(string_split($hostL, '.')) - 1]
             || '.' || string_split($hostL, '.')[len(string_split($hostL, '.'))]
         END)"""

  private val hostLSql: String =
    """lower(regexp_extract(regexp_extract(url,
       '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^([^:]*)', 1))"""

  // ---- registered queries ----------------------------------------------

  /** Per-document parse: every component plus the registrable domain —
    * the map stage every downstream URL query builds on.
    */
  def urlParse(s: SparkSession, d: String): DataFrame =
    withUrl(s, d).select(
      col("doc_id"),
      urlScheme(col("url")).as("scheme"),
      urlHost(col("url")).as("host"),
      when(urlPortStr(col("url")) === "", lit(0L))
        .otherwise(urlPortStr(col("url")).cast("long")).as("port"),
      registrableDomain(urlHost(col("url"))).as("regdomain"),
      urlPath(col("url")).as("path"),
      size(filter(split(urlQuery(col("url")), "&"),
        x => length(x) > 0)).cast("long").as("n_params"),
      (urlFragment(col("url")) =!= "").cast("long").as("has_fragment"))
      .orderBy(col("doc_id"))

  /** Per-registrable-domain crawl rollup: docs, distinct hosts, https
    * share (per-mille integer), total chars — the per-domain quality
    * screen every crawl pipeline runs before sampling.
    */
  def domainRollup(s: SparkSession, d: String): DataFrame =
    withUrl(s, d).select(col("n_chars"),
      urlScheme(col("url")).as("scheme"),
      urlHost(col("url")).as("host"))
      .withColumn("regdomain", registrableDomain(col("host")))
      .groupBy(col("regdomain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum((col("scheme") === "https").cast("long")).as("n_https"),
        sum(col("n_chars")).as("sum_chars"))
      // integral per-mille: `div` = DuckDB `//` on non-negatives
      .select(col("regdomain"), col("n_docs"), col("n_hosts"),
        expr("(1000 * n_https) div n_docs").as("https_permille"),
        col("sum_chars"))
      .orderBy(col("regdomain"))

  /** URL-normalized dedup accounting per registrable domain: raw URLs vs
    * canonical pages after [[normalizedUrl]], duplicate rate per-mille.
    * The derivation plants 4 raw variants per canonical page, so the
    * merge is provably load-bearing (and the g%7 real-:8080 groups prove
    * normalization does NOT over-merge distinct ports).
    */
  def dedupNormalized(s: SparkSession, d: String): DataFrame =
    withUrl(s, d).select(
      registrableDomain(urlHost(col("url"))).as("regdomain"),
      normalizedUrl(col("url")).as("nurl"))
      .groupBy(col("regdomain"))
      .agg(count(lit(1)).as("n_raw"),
        countDistinct(col("nurl")).as("n_canonical"))
      .withColumn("dup_permille",
        expr("(1000 * (n_raw - n_canonical)) div n_raw"))
      .orderBy(col("regdomain"))

  /** Query-param key census over raw URLs (tracking-param hygiene: which
    * keys dominate, how many are utm_*) — explode params, count by key.
    */
  def topParams(s: SparkSession, d: String): DataFrame =
    withUrl(s, d)
      .select(explode(filter(split(urlQuery(col("url")), "&"),
        x => length(x) > 0)).as("kv"))
      .select(regexp_extract(col("kv"), "^([^=]*)", 1).as("pkey"))
      .groupBy(col("pkey"))
      .agg(count(lit(1)).as("n"))
      .withColumn("is_tracking",
        (substring(col("pkey"), 1, 4) === "utm_").cast("long"))
      .orderBy(col("n").desc, col("pkey"))
      .limit(10)

  /** Path-depth histogram (non-empty '/'-separated segments per URL) —
    * the crawl-frontier shape metric.
    */
  def pathDepth(s: SparkSession, d: String): DataFrame =
    withUrl(s, d)
      .select(size(filter(split(urlPath(col("url")), "/"),
        x => length(x) > 0)).cast("long").as("depth"))
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_urls"))
      .orderBy(col("depth"))

  val queries = Map(
    "url_parse" -> (urlParse _),
    "url_domain_rollup" -> (domainRollup _),
    "url_dedup_normalized" -> (dedupNormalized _),
    "url_top_params" -> (topParams _),
    "url_path_depth" -> (pathDepth _))

  val oracle = Map(
    "url_parse" ->
      s"""WITH $urlCte
         SELECT doc_id,
           regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS scheme,
           $hostLSql AS host,
           (CASE WHEN regexp_extract(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                  ':([0-9]+)$$', 1) = '' THEN 0
              ELSE CAST(regexp_extract(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                  ':([0-9]+)$$', 1) AS BIGINT) END) AS port,
           ${regdomSql(hostLSql)} AS regdomain,
           regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
           CAST(len(list_filter(string_split(
             regexp_extract(url, '^[^#?]*\\?([^#]*)', 1), '&'),
             x -> len(x) > 0)) AS BIGINT) AS n_params,
           CAST(CASE WHEN regexp_extract(url, '#(.*)$$', 1) <> ''
             THEN 1 ELSE 0 END AS BIGINT) AS has_fragment
         FROM u ORDER BY doc_id""",
    "url_domain_rollup" ->
      s"""WITH $urlCte,
         p AS (SELECT n_chars,
             regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)
               AS scheme,
             $hostLSql AS host,
             ${regdomSql(hostLSql)} AS regdomain
           FROM u)
         SELECT regdomain, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST((1000 * CAST(sum(CASE WHEN scheme = 'https' THEN 1 ELSE 0
             END) AS BIGINT)) // count(*) AS BIGINT) AS https_permille,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM p GROUP BY regdomain ORDER BY regdomain""",
    "url_dedup_normalized" ->
      s"""WITH $urlCte,
         p AS (SELECT ${regdomSql(hostLSql)} AS regdomain,
             ${normSql("url")} AS nurl
           FROM u)
         SELECT regdomain, n_raw, n_canonical,
           CAST((1000 * (n_raw - n_canonical)) // n_raw AS BIGINT)
             AS dup_permille
         FROM (SELECT regdomain, CAST(count(*) AS BIGINT) AS n_raw,
             CAST(count(DISTINCT nurl) AS BIGINT) AS n_canonical
           FROM p GROUP BY regdomain)
         ORDER BY regdomain""",
    "url_top_params" ->
      s"""WITH $urlCte,
         kv AS (SELECT unnest(list_filter(string_split(
             regexp_extract(url, '^[^#?]*\\?([^#]*)', 1), '&'),
             x -> len(x) > 0)) AS kv
           FROM u)
         SELECT pkey, n,
           CAST(CASE WHEN substring(pkey, 1, 4) = 'utm_' THEN 1 ELSE 0
             END AS BIGINT) AS is_tracking
         FROM (SELECT regexp_extract(kv, '^([^=]*)', 1) AS pkey,
             CAST(count(*) AS BIGINT) AS n
           FROM kv GROUP BY 1)
         ORDER BY n DESC, pkey LIMIT 10""",
    "url_path_depth" ->
      s"""WITH $urlCte
         SELECT CAST(len(list_filter(string_split(
             regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/'),
             x -> len(x) > 0)) AS BIGINT) AS depth,
           CAST(count(*) AS BIGINT) AS n_urls
         FROM u GROUP BY 1 ORDER BY depth""")
}
