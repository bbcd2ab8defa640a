package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  test("host extraction: scheme, userinfo, port, path, query, fragment") {
    val cases = Seq(
      ("https://www.example.com/a/b?q=1", "www.example.com"),
      ("http://user:pw@docs.example.com/x", "docs.example.com"),
      ("https://blog.example.io:8443/", "blog.example.io"),
      ("ftp://cdn.example.net", "cdn.example.net"),
      ("https://example.org#frag", "example.org"),
      ("not a url at all", ""),          // no scheme → empty
      ("//scheme.less/path", "")
    ).toDF("url", "expected")
    val bad = cases.filter(Urls.host($"url") =!= $"expected").count()
    assert(bad === 0L)
  }

  test("registered domain is the last two labels (naive eTLD, documented)") {
    val cases = Seq(
      ("www.example.com", "example.com"),
      ("a.b.c.example.org", "example.org"),
      ("example.io", "example.io"),
      ("localhost", "")                  // single label → no match
    ).toDF("host", "expected")
    val bad = cases
      .filter(Urls.registeredDomain($"host") =!= $"expected").count()
    assert(bad === 0L)
  }

  test("applyBlocklist drops exactly the blocked domains' docs") {
    val docs = Seq(
      (0L, "https://www.good.com/a"),
      (1L, "https://spam.bad.net/b"),
      (2L, "https://cdn.bad.net:80/c"),
      (3L, "https://ok.also-good.io/d")
    ).toDF("doc_id", "url")
    val kept = Urls.applyBlocklist(docs, Seq("bad.net").toDF("domain"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(0L, 3L))
  }
}
