package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.UrlFns

class UrlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(url: String, c: org.apache.spark.sql.Column): Any = {
    val r = Seq(url).toDF("u").select(c.as("v")).head()
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("host / path / params / fragment extraction") {
    val u = "HTTPS://www.Example.COM:443/a/b/c?b=2&a=1#frag"
    assert(one(u, UrlFns.urlScheme(col("u"))) == "https")
    assert(one(u, UrlFns.urlHost(col("u"))) == "www.Example.COM")
    assert(one(u, UrlFns.urlPath(col("u"))) == "/a/b/c")
    assert(one(u, UrlFns.urlQuery(col("u"))) == "b=2&a=1")
    assert(one(u, UrlFns.urlFragment(col("u"))) == "frag")
    assert(one(u, UrlFns.urlParam(col("u"), "a")) == "1")
    assert(one(u, UrlFns.urlParam(col("u"), "missing")) == null)
    assert(one(u, UrlFns.urlPathDepth(col("u"))) == 3)
    assert(one("http://h.io", UrlFns.urlPathDepth(col("u"))) == 0)
  }

  test("registered domain heuristic") {
    def dom(h: String) =
      Seq(h).toDF("h").select(UrlFns.registeredDomain(col("h"))).head().getString(0)
    assert(dom("www.example.com") == "example.com")
    assert(dom("Example.COM") == "example.com")
    assert(dom("news.bbc.co.uk") == "bbc.co.uk")
    assert(dom("a.b.c.gov.au") == "c.gov.au")
    assert(dom("localhost") == "localhost")
    assert(dom("deep.sub.domain.org") == "domain.org")
    // 'co' as the 2nd-to-last label only triggers under a 2-letter cc
    assert(dom("shop.co.com") == "co.com")
  }

  test("normalizeUrl: ports, param sort, fragment stripping") {
    def norm(u: String) =
      Seq(u).toDF("u").select(UrlFns.normalizeUrl(col("u"))).head().getString(0)
    assert(norm("HTTPS://Ex.COM:443/p?b=2&a=1#x") == "https://ex.com/p?a=1&b=2")
    assert(norm("http://ex.com:80/p") == "http://ex.com/p")
    assert(norm("http://ex.com:8080/p?z=1") == "http://ex.com:8080/p?z=1")
    assert(norm("https://ex.com") == "https://ex.com")
    assert(norm("https://ex.com/a?one=1") == "https://ex.com/a?one=1")
  }
}
