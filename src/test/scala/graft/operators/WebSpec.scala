package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpecBase

class WebSpec extends SparkSpecBase {
  import spark.implicits._

  private def dom(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(Web.registrableDomain(Web.hostOf(col("u"))))
      .as[String].collect().toSeq

  test("hostOf + registrableDomain: schemes, ports, paths, deep subdomains") {
    assert(dom(
      "https://www.example.com/a/b?q=1",
      "http://a.b.example.org:8080/x",
      "example.io/no-scheme-path",
      "deep.news.example.co.uk",
      "bare-host.com",
      "https://example.com") == Seq(
      "example.com", "example.org", "example.io",
      "example.co.uk", "bare-host.com", "example.com"))
  }

  test("registrableDomain: at-or-below suffix boundary passes through") {
    // a bare multi-label suffix or single label has no registrable part
    assert(dom("co.uk", "localhost") == Seq("co.uk", "localhost"))
  }
}
