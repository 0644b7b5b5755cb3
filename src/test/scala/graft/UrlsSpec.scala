package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.web.Urls

class UrlsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.normalize(col("u"))).as[String]
      .collect().toSeq

  test("normalize: case, default ports, fragments, trailing slashes") {
    assert(norm(
      "HTTPS://WWW.Example.COM:443/Path/1/",
      "http://a.com:80/",
      "http://a.com:8080/p/",
      "https://a.com:80/p",        // 80 is NOT default for https — kept
      "http://a.com/p#frag",
      "https://a.com",             // no path → root
      "https://a.com///",          // slashes-only path → root
      "https://a.com/p?q=1#f"
    ) == Seq(
      "https://www.example.com/Path/1",
      "http://a.com/",
      "http://a.com:8080/p",
      "https://a.com:80/p",
      "http://a.com/p",
      "https://a.com/",
      "https://a.com/",
      "https://a.com/p?q=1"))
  }

  test("normalize: utm params stripped in all three positions") {
    assert(norm(
      "http://a.com/p?utm_source=x&q=2",   // leading, more follow
      "http://a.com/p?utm_a=1&utm_b=2&c=3", // consecutive leading
      "http://a.com/p?utm_a=1",             // lone
      "http://a.com/p?a=1&utm_b=2&utm_c=3", // trailing pair
      "http://a.com/?utm_a=1",              // root + lone utm
      "http://a.com/p?a=1&b=2"              // none — untouched
    ) == Seq(
      "http://a.com/p?q=2",
      "http://a.com/p?c=3",
      "http://a.com/p",
      "http://a.com/p?a=1",
      "http://a.com/",
      "http://a.com/p?a=1&b=2"))
  }

  test("normalize: non-URL input passes through unchanged") {
    assert(norm("not a url", "", "ftp:/missing-slash")
      == Seq("not a url", "", "ftp:/missing-slash"))
  }

  test("path and query case are preserved; only scheme+host fold") {
    assert(norm("HTTP://A.COM/CaseD/Path?Q=Vv")
      == Seq("http://a.com/CaseD/Path?Q=Vv"))
  }

  test("host / scheme / registeredDomain") {
    val df = Seq("HTTPS://WWW.Sub.Example.COM:8443/p?x=1#f",
      "http://localhost:9000/x", "https://example.com/").toDF("u")
    val got = df.select(Urls.scheme(col("u")), Urls.host(col("u")),
      Urls.registeredDomain(col("u"))).as[(String, String, String)]
      .collect().toSeq
    assert(got == Seq(
      ("https", "www.sub.example.com", "example.com"),
      ("http", "localhost", "localhost"),
      ("https", "example.com", "example.com")))
  }

  test("normalize is idempotent on its own output") {
    val raw = Seq("HTTPS://A.com:443/p/?utm_a=1&q=2#f",
      "http://b.com//x//", "https://c.com")
    val once = norm(raw: _*)
    assert(norm(once: _*) == once)
  }

  // ---- Links ---------------------------------------------------------

  test("anchors: extracts href+text pairs; skips href-less and markup bodies") {
    val html =
      """<p>x</p><a class="c" href="http://a.com/1">first</a>
        |<a name="n">no href</a>
        |<a href="http://b.com/2">has <b>markup</b></a>
        |<a href="http://c.com/3"> third link </a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(explode(graft.web.Links.anchors(col("h"))).as("a"))
      .select(col("a.href"), col("a.anchor")).as[(String, String)]
      .collect().toSeq
    // the markup-bodied anchor is the documented recall tail: skipped
    assert(got == Seq(("http://a.com/1", "first"),
      ("http://c.com/3", " third link ")))
  }

  test("linkRecords: canonical target URL + registered domain per link") {
    val df = Seq((7L,
      """<a href="HTTP://WWW.A.COM:80/x/?utm_s=1">one</a>""" +
        """<a href="https://sub.b.org/y/">two</a>""")).toDF("id", "html")
    val got = graft.web.Links.linkRecords(df, col("html"), col("id"))
      .as[(Long, String, String, String, String)].collect().toSeq
    assert(got == Seq(
      (7L, "HTTP://WWW.A.COM:80/x/?utm_s=1", "one",
        "http://www.a.com/x", "a.com"),
      (7L, "https://sub.b.org/y/", "two",
        "https://sub.b.org/y", "b.org")))
  }
}
