package graft.ops

import graft.{GraftSuite, Tables}
import org.apache.spark.sql.functions._

class UrlsAndRuntimeFilterSpec extends GraftSuite {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Urls.normalizeUrl(col("u"))).as[String].head()

  private def domain(u: String): String =
    Seq(u).toDF("u")
      .select(Urls.registrableDomain(Urls.host(Urls.normalizeUrl(col("u")))))
      .as[String].head()

  test("normalizeUrl strips scheme, www, query, fragment, trailing slash") {
    assert(norm("HTTPS://WWW.Example.COM/A/B/?q=1&r=2#frag") === "example.com/a/b")
    assert(norm("http://example.com") === "example.com")
    assert(norm("ftp://www.x.org/pub/") === "x.org/pub")
    // no scheme / no www: untouched apart from lowering
    assert(norm("Example.com/Page") === "example.com/page")
    // www only stripped as a leading label, not mid-host
    assert(norm("sub.www.example.com/p") === "sub.www.example.com/p")
  }

  test("normalizeUrl is idempotent") {
    val raw = "HTTPS://WWW.Example.COM/A/B/?q=1#f"
    assert(norm(norm(raw)) === norm(raw))
  }

  test("registrableDomain takes the last two host labels") {
    assert(domain("https://a.b.example.com/x") === "example.com")
    assert(domain("https://example.com:8080/x") === "example.com")
    assert(domain("https://localhost/x") === "") // single label: no match
  }

  test("bloomSemiJoin result equals the exact semi join") {
    val dim = Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING")
    val fact = Tables.orders(spark, sf)
    val got = RuntimeFilter.bloomSemiJoin(fact, dim, "o_custkey", "c_custkey",
        expectedItems = 10000L, fpp = 0.01)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val want = fact.join(dim, fact("o_custkey") === dim("c_custkey"), "left_semi")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("bloomSemiJoin with tiny fpp-stressed sketch still exact (prefilter only)") {
    // deliberately undersized sketch -> many false positives; the exact
    // semi join behind the filter must still make the result exact
    val dim = Seq(1L, 3L).toDF("k")
    val fact = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).toDF("fk")
    val got = RuntimeFilter.bloomSemiJoin(fact, dim, "fk", "k",
        expectedItems = 1L, fpp = 0.5)
      .as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 3L))
  }
}
