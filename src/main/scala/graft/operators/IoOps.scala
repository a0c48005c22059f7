package graft.operators

import graft.{OpFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink formats (SURVEY.md §2.2): CSV, JSON-lines, and plain text —
  * the reference's native I/O surface — plus parquet (the gate format,
  * exercised by every other query). Each query is a write→read round trip
  * through /tmp followed by an aggregation; the oracle runs the same
  * aggregation on the original parquet, so the check proves the format
  * encode/decode is lossless for the data it carries.
  *
  * Scale notes: all three writers/readers are distributed (one file per
  * partition, splittable reads for text/CSV/JSON-lines); the explicit CSV
  * schema avoids the non-scalable inferSchema pre-pass.
  */
object IoOps extends OpFamily {
  private val ioRoot = "/tmp/graft_io"

  /** orders → CSV (header) → read with explicit schema → aggregate. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = s"$ioRoot/orders_csv"
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").option("header", "true").csv(path)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    s.read.option("header", "true").schema(schema).csv(path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** events → JSON-lines → read → aggregate (schema carried by the JSON). */
  def jsonlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = s"$ioRoot/events_json"
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
      .write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    s.read.schema(schema).json(path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .orderBy(col("event_type"))
  }

  /** documents.text → text files → read → wordcount top-10 (the classic
    * MR text-line input surface, line-per-record).
    */
  def textRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = s"$ioRoot/docs_text"
    Tables.documents(s, d).select(col("text"))
      .write.mode("overwrite").text(path)
    s.read.text(path)
      .select(explode(split(col("value"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("word"))
      .limit(10)
  }

  /** Data generation (MRDP ch.7): spark.range + deterministic columns,
    * aggregated — no input files at all.
    */
  def generate(s: SparkSession, d: String): DataFrame =
    s.range(0, 100000)
      .select(col("id"), pmod(col("id") * 2654435761L, lit(1000)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .filter(col("bucket") < 20)
      .orderBy(col("bucket"))

  val queries = Map(
    "io_csv_roundtrip" -> (csvRoundtrip _),
    "io_jsonl_roundtrip" -> (jsonlRoundtrip _),
    "io_text_roundtrip" -> (textRoundtrip _),
    "io_generate" -> (generate _))

  val oracle = Map(
    "io_csv_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "io_jsonl_roundtrip" ->
      """SELECT event_type, count(*) AS n, min(value) AS min_v,
           max(value) AS max_v
         FROM events GROUP BY event_type ORDER BY event_type""",
    "io_text_roundtrip" ->
      """SELECT word, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         WHERE word <> '' GROUP BY word ORDER BY n DESC, word LIMIT 10""",
    "io_generate" ->
      """SELECT bucket, count(*) AS n, min(id) AS min_id, max(id) AS max_id
         FROM (SELECT range AS id, (range * 2654435761) % 1000 AS bucket
               FROM range(0, 100000))
         WHERE bucket < 20 GROUP BY bucket ORDER BY bucket""")
}
