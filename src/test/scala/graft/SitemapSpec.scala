package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Fetch
import graft.sources.Fetch.FetchPolicy

/** Sitemap-driven frontier seeding: index recursion, gzip sniffing,
  * loc canonicalization, lastmod passthrough, depth/size bounds and
  * ledger-backed resumability. Scripted static transport (no egress,
  * no $outer in the task closure). */
class SitemapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  import SitemapSpec._

  private def noSleep: Long => Unit = _ => ()
  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-sitemap").toString

  private def gzip(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(s.getBytes("UTF-8")); out.close()
    bos.toByteArray
  }

  test("index recursion + gzip child + canonical locs + lastmod") {
    val index =
      """<?xml version="1.0"?><sitemapindex>
        |<sitemap><loc>http://h.test/s1.xml</loc></sitemap>
        |<sitemap><loc>http://h.test/s2.xml.gz</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val s1 =
      """<urlset>
        |<url><loc>HTTP://H.test:80/a?b=2&amp;a=1#frag</loc>
        |<lastmod>2026-04-01</lastmod></url>
        |<url><loc>http://h.test/b</loc></url>
        |</urlset>""".stripMargin
    val s2 = "<urlset><url><loc>http://h.test/c</loc></url></urlset>"
    pages.put("sm1", Map(
      "http://h.test/index.xml" -> index.getBytes("UTF-8"),
      "http://h.test/s1.xml" -> s1.getBytes("UTF-8"),
      "http://h.test/s2.xml.gz" -> gzip(s2)))
    val seeds = Fetch.sitemapSeeds(spark,
      Seq("http://h.test/index.xml").toDF("u"), "u", tmpDir(),
      new MapTransport("sm1"), FetchPolicy(1), sleeper = noSleep)
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        r.getString(2))).toSet
    assert(seeds === Set(
      ("http://h.test/a?a=1&b=2", Some("2026-04-01"), "http://h.test/s1.xml"),
      ("http://h.test/b", None, "http://h.test/s1.xml"),
      ("http://h.test/c", None, "http://h.test/s2.xml.gz")))
  }

  test("a self-referencing index terminates at maxDepth") {
    val loop = """<sitemapindex><sitemap><loc>http://l.test/i.xml</loc>
      |</sitemap></sitemapindex>""".stripMargin
    pages.put("sm2", Map("http://l.test/i.xml" -> loop.getBytes("UTF-8")))
    val seeds = Fetch.sitemapSeeds(spark,
      Seq("http://l.test/i.xml").toDF("u"), "u", tmpDir(),
      new MapTransport("sm2"), FetchPolicy(1), maxDepth = 3,
      sleeper = noSleep)
    assert(seeds.count() === 0)
  }

  test("an index bomb is refused loudly before any fetch of that level") {
    val bomb = (1 to 50).map(i =>
      s"<sitemap><loc>http://b.test/s$i.xml</loc></sitemap>")
      .mkString("<sitemapindex>", "", "</sitemapindex>")
    pages.put("sm3", Map("http://b.test/i.xml" -> bomb.getBytes("UTF-8")))
    val e = intercept[IllegalArgumentException] {
      Fetch.sitemapSeeds(spark, Seq("http://b.test/i.xml").toDF("u"), "u",
        tmpDir(), new MapTransport("sm3"), FetchPolicy(1),
        maxSitemaps = 10L, sleeper = noSleep)
    }
    assert(e.getMessage.contains("maxSitemaps"))
    // level 0 was fetched; none of the 50 children were
    assert(hits.keySet().stream()
      .filter(k => k.startsWith("sm3|http://b.test/s")).count() === 0)
  }

  test("sitemapSeedsFromRobots: robots Sitemap directives feed the harvest") {
    val robots = """User-agent: *
      |Disallow: /private
      |Sitemap: http://rb.test/s1.xml  # primary
      |sitemap:http://rb.test/s2.xml
      |""".stripMargin
    val s1 = "<urlset><url><loc>http://rb.test/a</loc></url></urlset>"
    val s2 = "<urlset><url><loc>http://rb.test/b</loc>" +
      "<lastmod>2026-05-06</lastmod></url></urlset>"
    pages.put("sm5", Map(
      "http://rb.test/robots.txt" -> robots.getBytes("UTF-8"),
      "http://rb.test/s1.xml" -> s1.getBytes("UTF-8"),
      "http://rb.test/s2.xml" -> s2.getBytes("UTF-8")))
    // trailing slash on the host base must not double up
    val seeds = Fetch.sitemapSeedsFromRobots(spark,
      Seq("http://rb.test/").toDF("h"), "h", tmpDir(),
      new MapTransport("sm5"), FetchPolicy(1), sleeper = noSleep)
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(seeds === Set(
      ("http://rb.test/a", None),
      ("http://rb.test/b", Some("2026-05-06"))))
  }

  test("a re-run over the same ledger re-parses without re-fetching") {
    val s = "<urlset><url><loc>http://r.test/x</loc></url></urlset>"
    pages.put("sm4", Map("http://r.test/s.xml" -> s.getBytes("UTF-8")))
    val dir = tmpDir()
    val t = new MapTransport("sm4")
    def run() = Fetch.sitemapSeeds(spark,
      Seq("http://r.test/s.xml").toDF("u"), "u", dir, t, FetchPolicy(1),
      sleeper = noSleep).collect().map(_.getString(0)).toSeq
    assert(run() === Seq("http://r.test/x"))
    val fetchesAfterFirst = hits.get("sm4|http://r.test/s.xml")
    assert(run() === Seq("http://r.test/x"))
    assert(hits.get("sm4|http://r.test/s.xml") === fetchesAfterFirst,
      "second run must be served from the ledger")
  }
}

object SitemapSpec {
  val pages = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, Array[Byte]]]()
  val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Serves a static page map; 404s terminally on anything else.
    * Companion-static like FlakyTransport (closure-safe). */
  class MapTransport(tag: String) extends Fetch.FetchTransport {
    override def fetch(url: String): Array[Byte] = {
      hits.merge(s"$tag|$url", Integer.valueOf(1),
        ((a: Integer, b: Integer) => Integer.valueOf(a + b)):
          java.util.function.BiFunction[Integer, Integer, Integer])
      SitemapSpec.pages.get(tag).getOrElse(url,
        throw new Fetch.TerminalFetchException(s"404 $url"))
    }
  }
}
