package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.Graft

/** The generic URL operators (graft.operators.UrlOps via the Graft API) on
  * hand-built URLs — real-world malformations the derived fixture never
  * produces: scheme-less strings, bare hosts, single-label hosts, empty
  * queries, explicit default and non-default ports, mixed case.
  */
class UrlOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def parsedMap(url: String): Map[String, Any] = {
    val row = Graft.parseUrls(Seq(url).toDF("u"), "u").collect().head
    row.schema.fieldNames.map(n => n -> row.getAs[Any](n)).toMap
  }

  private def norm(url: String): String =
    Graft.normalizeUrls(Seq(url).toDF("u"), "u")
      .collect().head.getAs[String]("url_normalized")

  test("full URL parses into all components") {
    val p = parsedMap("https://WWW.Example.CO.UK:8443/a/b/c?x=1&y=2#frag")
    assert(p("url_scheme") === "https")
    assert(p("url_host") === "www.example.co.uk")
    assert(p("url_port") === 8443L)
    assert(p("url_regdomain") === "example.co.uk")
    assert(p("url_path") === "/a/b/c")
    assert(p("url_query") === "x=1&y=2")
    assert(p("url_fragment") === "frag")
  }

  test("parse is total on malformed input (no scheme, bare strings)") {
    for (bad <- Seq("", "no scheme at all", "example.com/path?x=1",
      "://missing", "https:/half", "ftp:")) {
      val p = parsedMap(bad) // must not throw
      assert(p("url_scheme") === "")
      assert(p("url_host") === "")
      assert(p("url_port") === 0L)
    }
  }

  test("single-label and empty hosts pass through registrableDomain") {
    assert(parsedMap("http://localhost:9000/x")("url_regdomain")
      === "localhost")
    assert(parsedMap("not a url")("url_regdomain") === "")
    assert(parsedMap("http://cdn.static.example.com/i.png")("url_regdomain")
      === "example.com")
  }

  test("normalization strips exactly what is not page identity") {
    // case, default port, trailing slash, utm params, param order, fragment
    assert(norm("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#top")
      === "https://www.example.com/a/b?a=1&b=2")
    assert(norm("http://example.com:80/x") === "http://example.com/x")
  }

  test("normalization keeps what IS page identity") {
    // real port, https-default port on http (and vice versa), params
    assert(norm("http://example.com:443/x") === "http://example.com:443/x")
    assert(norm("https://example.com:8080/x") === "https://example.com:8080/x")
    assert(norm("https://example.com/x?id=1") === "https://example.com/x?id=1")
    // root path: bare host and lone slash canonicalize to '/'
    assert(norm("https://example.com") === "https://example.com/")
    assert(norm("https://example.com/") === "https://example.com/")
  }

  test("Graft.anomalies flags only the spike hour against the prior EWMA") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:15:00")
    // steady 4.0/hour, then a 40.0 spike at hour 3: baseline e2 = 4e6,
    // dev = (1000·36e6) div 4e6 = 9000 ≥ 3000 — only that hour flags
    val pts = Seq(("a", ts(0), 4.0), ("a", ts(1), 4.0), ("a", ts(2), 4.0),
      ("a", ts(3), 40.0)).toDF("k", "at", "v")
    val out = Graft.anomalies(pts, "k", "at", "v").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("dev_permille") === 9000L)
    assert(out.head.getAs[Long]("baseline_units") === 4000000L)
  }

  test("Graft.ewma smooths an ad-hoc renamed frame") {
    import java.sql.Timestamp
    val pts = Seq(
      ("a", Timestamp.valueOf("2026-01-01 00:10:00"), 4.0),
      ("a", Timestamp.valueOf("2026-01-01 01:10:00"), 8.0))
      .toDF("sensor", "at", "reading")
    val out = Graft.ewma(pts, "sensor", "at", "reading").collect()
    assert(out.map(_.getAs[Long]("ewma_units")).toSeq
      === Seq(4000000L, 5000000L))
    assert(out.head.getAs[String]("sensor") === "a")
  }

  test("Graft.holt tracks a falling series with a negative floor-shift trend") {
    import java.sql.Timestamp
    // hourly micro-sums 1000, 500, 100 (values ·1e-6):
    //   l₁=1000, b₁=0
    //   l₂=(500+3·1000)>>2=875,  b₂=(875−1000)>>2=(−125)>>2=−32 (floor!)
    //   l₃=(100+3·(875−32))>>2=657, b₃=(657−875−96)>>2=(−314)>>2=−79
    val pts = Seq(
      ("a", Timestamp.valueOf("2026-01-01 00:10:00"), 0.001),
      ("a", Timestamp.valueOf("2026-01-01 01:10:00"), 0.0005),
      ("a", Timestamp.valueOf("2026-01-01 02:10:00"), 0.0001))
      .toDF("sensor", "at", "reading")
    val out = Graft.holt(pts, "sensor", "at", "reading").collect()
      .map(r => (r.getAs[Long]("level_units"), r.getAs[Long]("trend_units"),
        r.getAs[Long]("forecast_units")))
    assert(out.toSeq === Seq((1000L, 0L, 1000L), (875L, -32L, 843L),
      (657L, -79L, 578L)))
  }

  test("Graft.holtBacktest: exact replay on a ramp; Holt beats naive") {
    import java.sql.Timestamp
    // 40 hourly points climbing 1/hour → micro-sums 1e6, 2e6, ...
    // (integral values: i.toDouble·1e6 is IEEE-exact, i·1e-6·1e6 is NOT);
    // after warm-up Holt has learned the slope, persistence always errs
    val pts = (1 to 40).map(i => ("a",
      new Timestamp(1767225600000L + i * 3600000L), i.toDouble))
      .toDF("sensor", "at", "reading")
    val out = Graft.holtBacktest(pts, "sensor", "at", "reading")
      .collect().head
    // driver replay of the shift-fold
    val sums = (1 to 40).map(_ * 1000000L)
    val lb = sums.tail.foldLeft(Vector((sums.head, 0L))) { (acc, x) =>
      val (pl, pb) = acc.last
      val l = (x + 3 * (pl + pb)) >> 2
      acc :+ ((l, (l - pl + 3 * pb) >> 2))
    }
    val evalIdx = 25 to 40 // 1-based rn > 24
    val holtAbs = evalIdx.map(t =>
      math.abs(sums(t - 1) - (lb(t - 2)._1 + lb(t - 2)._2))).sum
    val naiveAbs = evalIdx.map(t => math.abs(sums(t - 1) - sums(t - 2))).sum
    assert(out.getAs[Long]("n_evals") === 16L)
    assert(out.getAs[Long]("holt_abs_units") === holtAbs)
    assert(out.getAs[Long]("naive_abs_units") === naiveAbs)
    assert(out.getAs[Long]("skill_permille") ===
      1000L - holtAbs * 1000L / naiveAbs)
    assert(out.getAs[Long]("skill_permille") > 0L,
      "Holt must beat persistence on a clean ramp")
  }

  test("normalization is idempotent") {
    for (u <- Seq(
      "HTTPS://A.Example.COM:443/a/?utm_medium=m&z=9&a=1#f",
      "http://example.co.uk:8080/deep/path///",
      "https://example.com",
      "http://localhost/x?utm_a=1")) {
      val once = norm(u)
      assert(norm(once) === once, s"not idempotent for $u")
    }
  }
}
