package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.web

class WebSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("s").select(c.cast("string").as("r")).head().getString(0)

  // ---- strip_html_tags / entities ----

  test("strip_html_tags: the reference's bare tag strip") {
    assert(one(web.strip_html_tags(col("s")),
      "<p>in <b>nahuatl</b> corpus</p>") === "in  nahuatl  corpus")
  }

  test("decode_entities: five predefined + numeric forms, amp last") {
    assert(one(web.decode_entities(col("s")),
      "a &lt;b&gt; &quot;c&quot; &#39;d&#39; &nbsp;&amp;lt;") ===
      "a <b> \"c\" 'd'  &lt;")
  }

  test("encode/decode entities round-trip structural chars") {
    val raw = "x < y & y > z & \"q\""
    assert(one(web.decode_entities(web.encode_entities(col("s"))), raw) === raw)
  }

  // ---- html_main_text ----

  private val page =
    """<html><head><title>Site Title Words Words Words</title>
      |<style>body { color: red; }</style>
      |<script>var tracking = "evil analytics beacon payload";</script>
      |</head><body>
      |<header><h1>Big Site Banner Headline Words</h1></header>
      |<nav><a href="/a">Home page link</a> <a href="/b">About page link</a></nav>
      |<!-- a comment full of words that must never appear -->
      |<div id="sidebar"><a href="/x">one</a> <a href="/y">two</a>
      |<a href="/z">three related articles here</a></div>
      |<article>
      |<p>The first real paragraph has plenty of ordinary words and an
      |inline <a href="/ref">reference link</a> inside it.</p>
      |<p>Short.</p>
      |<p>The second real paragraph also carries enough words to pass
      |the block gate &amp; decodes entities like &lt;this&gt;.</p>
      |</article>
      |<footer>Copyright words in the footer navigation area</footer>
      |</body></html>""".stripMargin

  test("html_main_text keeps scored content blocks only, in order") {
    val out = one(web.html_main_text(col("s")), page)
    val lines = out.split("\n").toSeq
    assert(lines.size === 2, s"got: $out")
    assert(lines.head.startsWith("The first real paragraph"))
    assert(lines.head.contains("reference link"),
      "anchor text inside a real paragraph is content")
    assert(lines(1).endsWith("entities like <this>."))
    // chrome, hidden regions, link farms, short blocks: all gone
    for (bad <- Seq("Site Title", "Banner", "Home page", "color: red",
        "analytics", "comment full", "related articles", "Short.",
        "Copyright"))
      assert(!out.contains(bad), s"'$bad' leaked into: $out")
  }

  test("html_main_text: link farm dropped by density, not by words") {
    val farm = "<div><a href='/1'>first long link text here</a> " +
      "<a href='/2'>second long link text here</a></div>" +
      "<p>genuine paragraph with half a dozen plain words</p>"
    val out = one(web.html_main_text(col("s")), farm)
    assert(out === "genuine paragraph with half a dozen plain words")
  }

  test("html_main_text: <head> removal does not eat <header> tag pairs") {
    val h = "<head><title>gone words words words</title></head>" +
      "<header>banner words words words gone</header>" +
      "<p>kept paragraph of several plain words</p>"
    assert(one(web.html_main_text(col("s")), h) ===
      "kept paragraph of several plain words")
  }

  test("html_main_text: self-closing and attribute-bearing boundaries split") {
    val h = "<p class=\"a\">alpha block with enough words</p><br/>" +
      "<div data-x='1'>beta block with enough words</div>"
    assert(one(web.html_main_text(col("s")), h) ===
      "alpha block with enough words\nbeta block with enough words")
  }

  test("html_main_text: empty and chrome-only pages yield empty string") {
    assert(one(web.html_main_text(col("s")), "") === "")
    assert(one(web.html_main_text(col("s")),
      "<nav><a href='/'>only nav words here</a></nav>") === "")
  }

  // ---- canonical_url ----

  private def canon(s: String): String = one(web.canonical_url(col("s")), s)

  test("canonical_url: case, default port, fragment, empty path") {
    assert(canon("HTTP://Example.COM:80") === "http://example.com/")
    assert(canon("https://Example.com:443/A/B#frag") === "https://example.com/A/B")
    assert(canon("http://example.com:8080/x") === "http://example.com:8080/x")
    // path case is significant (RFC 3986: only scheme/host case-normalize)
    assert(canon("http://EX.com/CaSe") === "http://ex.com/CaSe")
  }

  test("canonical_url: query sort, tracker strip, empty query dropped") {
    assert(canon("http://e.com/p?b=2&a=1") === "http://e.com/p?a=1&b=2")
    assert(canon("http://e.com/p?utm_source=x&a=1&fbclid=z&gclid") ===
      "http://e.com/p?a=1")
    assert(canon("http://e.com/p?utm_campaign=x") === "http://e.com/p")
    assert(canon("http://e.com/p?") === "http://e.com/p")
    // a non-tracker param that merely starts with a tracker name survives
    assert(canon("http://e.com/p?utm=keep") === "http://e.com/p?utm=keep")
  }

  test("percent_normalize: unreserved decode, reserved uppercase, malformed untouched") {
    val pn = (s: String) => one(web.percent_normalize(col("s")), s)
    assert(pn("%61%2f%3a%G1%") === "a%2F%3A%G1%")
    assert(pn("%7E%7e%2D%5F") === "~~-_")
    assert(pn("no escapes at all") === "no escapes at all")
    assert(pn("%") === "%")
    assert(pn("%4") === "%4")
    assert(pn("caf%C3%A9") === "caf%C3%A9", "non-ASCII octets stay encoded")
  }

  test("canonical_url applies percent normalization before parsing") {
    assert(canon("http://EX.com/p%61th?x=%7e") === "http://ex.com/path?x=~")
    assert(canon("https://e.com/%2fa%2Fb") === "https://e.com/%2Fa%2Fb")
    // decoding %26 would change the query structure — it stays encoded
    assert(canon("http://e.com/p?a=x%26y") === "http://e.com/p?a=x%26y")
  }

  test("robots_sitemap_locs: anywhere in the file, comment-clipped, case-insensitive") {
    val txt = """User-agent: *
      |Disallow: /private
      |Sitemap: http://e.com/s1.xml  # the main one
      |user-agent: graft
      |sitemap:http://e.com/s2.xml.gz
      |SITEMAP:   # empty after comment clip
      |""".stripMargin
    val locs = Seq(txt).toDF("s")
      .select(explode(web.robots_sitemap_locs(col("s"))).as("l"))
      .collect().toSeq.map(_.getString(0))
    assert(locs === Seq("http://e.com/s1.xml", "http://e.com/s2.xml.gz"))
  }

  test("canonical_url: non-absolute and non-http inputs pass through") {
    assert(canon("  /relative/path?b=1 ") === "/relative/path?b=1")
    assert(canon("mailto:x@y.z") === "mailto:x@y.z")
    assert(canon("ftp://Host.Com:21/f") === "ftp://host.com:21/f")
  }

  // ---- sitemap parsing ----

  test("sitemap_entries: loc + optional lastmod, entity-decoded locs") {
    val xml = """<?xml version="1.0"?><urlset>
      |<url><loc> http://e.com/a?x=1&amp;y=2 </loc><lastmod>2026-01-02</lastmod></url>
      |<url><loc>http://e.com/b</loc></url>
      |</urlset>""".stripMargin
    val rows = Seq(xml).toDF("s")
      .select(explode(web.sitemap_entries(col("s"))).as("e"))
      .select(col("e.loc"), col("e.lastmod"))
      .collect().toSeq.map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows === Seq(
      ("http://e.com/a?x=1&y=2", Some("2026-01-02")),
      ("http://e.com/b", None)))
  }

  test("sitemap_index_locs: child sitemaps of an index") {
    val xml = "<sitemapindex><sitemap><loc>http://e.com/s1.xml</loc>" +
      "<lastmod>2026-02-03</lastmod></sitemap>" +
      "<sitemap><loc>http://e.com/s2.xml</loc></sitemap></sitemapindex>"
    val locs = Seq(xml).toDF("s")
      .select(explode(web.sitemap_index_locs(col("s"))).as("l"))
      .collect().toSeq.map(_.getString(0))
    assert(locs === Seq("http://e.com/s1.xml", "http://e.com/s2.xml"))
  }
}
