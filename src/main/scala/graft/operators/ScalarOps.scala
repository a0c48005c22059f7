package graft.operators

import graft.{OpFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Scalar function families (SURVEY.md §2.8). In the reference, every scalar
  * transformation is arbitrary Python inside the mapper; here each family is
  * surfaced through `org.apache.spark.sql.functions` built-ins so the whole
  * row pipeline stays inside WholeStageCodegen — no UDF, no interpreter
  * boundary, which is the difference between CPU-bound and
  * serialization-bound at 100 TB.
  *
  * All queries are narrow (no shuffle except the final presentation sort)
  * and project only the columns they use, so the parquet scan prunes to the
  * read set (visible as ReadSchema in `.explain("formatted")`).
  */
object ScalarOps extends OpFamily {

  /** String family: case, slice, concat, regex, edit distance. */
  def stringFns(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") <= 500)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 8).as("name8"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_type"), "[A-Z]+$", 0).as("last_word"),
        regexp_replace(col("p_name"), " ", "_").as("snake_name"),
        instr(col("p_name"), "a").as("first_a"),
        levenshtein(col("p_brand"), lit("Brand#11")).as("brand_dist"),
        reverse(col("p_brand")).as("rbrand"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded_key"),
        translate(col("p_brand"), "Bd", "bD").as("translated"),
        split_part(col("p_type"), lit(" "), lit(2)).as("type_word2"),
        col("p_name").like("%a%").as("has_a"),
        col("p_name").startsWith("a").as("starts_a"),
        col("p_name").endsWith("e").as("ends_e"),
        repeat(col("p_brand"), 2).as("brand_x2"),
        ascii(col("p_name")).as("first_code"),
        chr(lit(65) + (col("p_partkey") % 26)).as("letter"))
      .orderBy(col("p_partkey"))

  /** Date/time family: extraction, truncation, epoch, day arithmetic. */
  def datetimeFns(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        datediff(col("o_orderdate"),
          lit("1995-01-01").cast("date")).as("days_since_95"),
        last_day(col("o_orderdate")).as("eom"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        add_months(col("o_orderdate"), 1).cast("date").as("next_month"),
        date_add(col("o_orderdate"), 3).as("plus3d"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")),
          lit(1)).as("month_first"))
      .orderBy(col("o_orderkey"))

  /** Math family (only IEEE-deterministic fns — no per-row round). */
  def mathFns(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 49)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_disc"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        floor(col("l_extendedprice") / 1000).cast("long").as("price_k_floor"),
        ceil(col("l_extendedprice") / 1000).cast("long").as("price_k_ceil"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"),
        log(col("l_extendedprice")).as("ln_price"),
        exp(col("l_discount")).as("exp_disc"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** JSON family over events.props: path extraction + typed parse. */
  def jsonFns(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_id") < 5000)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_path"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k_typed"))
      .withColumn("k_sum", col("k_path") + col("k_typed"))
      .orderBy(col("event_id"))

  /** Array family over the embedding vectors (higher-order functions). */
  def arrayFns(s: SparkSession, d: String): DataFrame = {
    val dbl = transform(col("embedding"), _.cast("double"))
    Tables.embeddings(s, d)
      .filter(col("vec_id") < 500)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(dbl, 1).as("first_elem"),
        // scalar projections of slice() results: the gate's pandas compare
        // cannot sort rows containing array cells, so surface elements
        element_at(slice(dbl, 1, 4), 2).as("head4_2"),
        element_at(slice(dbl, 1, 4), 4).as("head4_4"),
        array_max(dbl).as("amax"),
        array_min(dbl).as("amin"),
        aggregate(dbl, lit(0.0), _ + _).as("asum"),
        size(filter(dbl, _ > 0.0)).as("n_pos"),
        array_position(dbl, array_max(dbl)).as("argmax_pos"),
        array_contains(dbl, array_max(dbl)).as("has_max"),
        element_at(slice(sort_array(dbl, asc = false), 1, 3), 3).as("top3_3"),
        aggregate(zip_with(dbl, reverse(dbl), _ * _), lit(0.0), _ + _)
          .as("dot_rev"))
      .orderBy(col("vec_id"))
  }

  /** Map family: construct, key-list, extract (oracle checks the values). */
  def mapFns(s: SparkSession, d: String): DataFrame = {
    val m = map(lit("type"), col("event_type"), lit("uid"),
      col("user_id").cast("string"))
    Tables.events(s, d)
      .filter(col("event_id") < 2000)
      .select(
        col("event_id"),
        element_at(m, "type").as("m_type"),
        element_at(m, "uid").as("m_uid"),
        concat_ws(",", array_sort(map_keys(m))).as("keys"),
        size(map_values(m)).as("n_vals"))
      .orderBy(col("event_id"))
  }

  /** Conditional family: CASE bands + coalesce/nullif fallback chains. */
  def condFns(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        when(col("value") < 50, "low")
          .when(col("value") < 120, "mid")
          .otherwise("high").as("band"),
        coalesce(nullif(col("event_type"), lit("view")), lit("(viewed)"))
          .as("type_or_tag"))
      .groupBy(col("band"), col("type_or_tag"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("band"), col("type_or_tag"))

  val queries = Map(
    "fn_string" -> (stringFns _),
    "fn_datetime" -> (datetimeFns _),
    "fn_math" -> (mathFns _),
    "fn_json" -> (jsonFns _),
    "fn_array" -> (arrayFns _),
    "fn_map" -> (mapFns _),
    "fn_cond" -> (condFns _))

  val oracle = Map(
    "fn_string" ->
      """SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
           length(p_name) AS name_len, substring(p_name, 1, 8) AS name8,
           concat_ws('|', p_brand, p_type) AS brand_type,
           regexp_extract(p_type, '[A-Z]+$') AS last_word,
           regexp_replace(p_name, ' ', '_', 'g') AS snake_name,
           strpos(p_name, 'a') AS first_a,
           levenshtein(p_brand, 'Brand#11') AS brand_dist,
           reverse(p_brand) AS rbrand,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           translate(p_brand, 'Bd', 'bD') AS translated,
           split_part(p_type, ' ', 2) AS type_word2,
           p_name LIKE '%a%' AS has_a,
           starts_with(p_name, 'a') AS starts_a,
           ends_with(p_name, 'e') AS ends_e,
           repeat(p_brand, 2) AS brand_x2,
           ascii(p_name) AS first_code,
           chr(CAST(65 + (p_partkey % 26) AS INTEGER)) AS letter
         FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""",
    "fn_datetime" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
           dayofmonth(o_orderdate) AS dom, quarter(o_orderdate) AS q,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_95,
           last_day(o_orderdate) AS eom,
           dayofweek(o_orderdate) + 1 AS dow,
           weekofyear(o_orderdate) AS iso_week,
           CAST(o_orderdate + INTERVAL '1 month' AS DATE) AS next_month,
           CAST(o_orderdate AS DATE) + 3 AS plus3d,
           make_date(year(o_orderdate), month(o_orderdate), 1) AS month_first
         FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_disc,
           sqrt(l_quantity) AS sqrt_qty,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           l_quantity * l_quantity AS qty_sq,
           ln(l_extendedprice) AS ln_price,
           exp(l_discount) AS exp_disc,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate
         FROM lineitem WHERE l_quantity >= 49
         ORDER BY l_orderkey, l_linenumber""",
    "fn_json" ->
      """SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
           CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_sum
         FROM events WHERE event_id < 5000 ORDER BY event_id""",
    "fn_array" ->
      """SELECT vec_id, len(embedding) AS dim,
           e[1] AS first_elem, e[1:4][2] AS head4_2, e[1:4][4] AS head4_4,
           list_max(e) AS amax, list_min(e) AS amin,
           list_sum(e) AS asum,
           len(list_filter(e, x -> x > 0.0)) AS n_pos,
           list_position(e, list_max(e)) AS argmax_pos,
           list_contains(e, list_max(e)) AS has_max,
           list_reverse_sort(e)[1:3][3] AS top3_3,
           list_sum(list_transform(range(1, len(e) + 1),
             i -> e[i] * e[len(e) + 1 - i])) AS dot_rev
         FROM (SELECT vec_id, embedding, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings)
         WHERE vec_id < 500 ORDER BY vec_id""",
    "fn_map" ->
      """SELECT event_id, event_type AS m_type,
           CAST(user_id AS VARCHAR) AS m_uid,
           'type,uid' AS keys, 2 AS n_vals
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "fn_cond" ->
      """SELECT CASE WHEN value < 50 THEN 'low'
                WHEN value < 120 THEN 'mid' ELSE 'high' END AS band,
           coalesce(nullif(event_type, 'view'), '(viewed)') AS type_or_tag,
           count(*) AS n
         FROM events GROUP BY band, type_or_tag
         ORDER BY band, type_or_tag""")
}
