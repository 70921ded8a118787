package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Fetch
import graft.sources.Fetch.{FetchPolicy, FetchTransport}

/** The resilient fetch loop: retry/backoff semantics, deterministic
  * jitter, per-host politeness partitioning, ledger shape, and
  * resume-across-waves (ok skipped, failures retried). All transports
  * are scripted fakes — the same injected-failure seam as JdbcSpec's
  * S9 retry path; zero egress. */
class FetchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  import FetchSpec.FlakyTransport

  private def noSleep: Long => Unit = _ => ()

  test("retry until success within maxAttempts; ledger records attempts") {
    val urls = Seq("http://a.test/1", "http://a.test/2", "http://b.test/3")
      .toDF("url")
    val t = new FlakyTransport("retry1",
      Map("http://a.test/1" -> 2, "http://b.test/3" -> 5))
    // NOTE: no orderBy before collect — a range-partitioned sort
    // SAMPLES its child first, re-running the side-effecting fetch
    // (the at-least-once caveat harvest's scaladoc documents)
    val ledger = Fetch.harvest(urls, "url", t,
      FetchPolicy(maxAttempts = 3, baseBackoffMs = 10), noSleep)
      .collect()
    val byUrl = ledger.map(r => r.getString(0) ->
      (r.getString(2), r.getInt(3), r.getString(6))).toMap
    assert(byUrl("http://a.test/1") === (("ok", 3, null)),
      "2 transient failures then success on attempt 3")
    assert(byUrl("http://a.test/2") === (("ok", 1, null)))
    val (st, at, err) = byUrl("http://b.test/3")
    assert(st === "failed" && at === 3 && err.contains("transient #3"),
      "terminal failure after maxAttempts, last error recorded")
  }

  test("ok rows carry payload bytes and their sha-256") {
    val ledger = Fetch.harvest(Seq("u1").toDF("url"), "url",
      new FlakyTransport("sha1", Map.empty), FetchPolicy(1), noSleep).head()
    val bytes = ledger.getAs[Array[Byte]]("content")
    assert(new String(bytes, "UTF-8") === "payload:u1")
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map(b => f"$b%02x").mkString
    assert(ledger.getAs[String]("content_sha256") === expected)
    assert(ledger.getAs[Long]("n_bytes") === bytes.length.toLong)
  }

  test("backoff schedule: exponential, capped, deterministic equal jitter") {
    val p = FetchPolicy(maxAttempts = 6, baseBackoffMs = 100,
      maxBackoffMs = 800, jitterSeed = 7)
    val seq1 = (1 to 5).map(a => Fetch.backoffMs(p, "http://x/1", a))
    val seq2 = (1 to 5).map(a => Fetch.backoffMs(p, "http://x/1", a))
    assert(seq1 === seq2, "same (url, attempt, seed) must give same jitter")
    // equal jitter: in [expo/2, expo], expo = min(cap, base * 2^(a-1))
    val expos = Seq(100L, 200L, 400L, 800L, 800L)
    seq1.zip(expos).foreach { case (b, e) =>
      assert(b >= e / 2 && b <= e, s"backoff $b outside [${e / 2}, $e]")
    }
    assert((Fetch.backoffMs(p, "http://x/2", 1) != seq1.head) ||
      (Fetch.backoffMs(p, "http://x/3", 1) != seq1.head),
      "jitter must vary across urls (hash-derived, not constant)")
  }

  test("the retry loop actually sleeps the scheduled backoffs") {
    // the sleeper records into a STATIC queue — task closures are
    // serialized even in local mode, so a captured local would be
    // mutated on a deserialized copy and stay empty here
    FetchSpec.sleeps.clear()
    val p = FetchPolicy(maxAttempts = 3, baseBackoffMs = 100,
      maxBackoffMs = 800, jitterSeed = 7)
    Fetch.harvest(Seq("http://s.test/a").toDF("url"), "url",
      new FlakyTransport("sleep1", Map("http://s.test/a" -> 2)), p,
      ms => FetchSpec.sleeps.add(ms)).collect()
    val expected = (1 to 2).map(a => Fetch.backoffMs(p, "http://s.test/a", a))
    assert(FetchSpec.sleeps.toArray.toSeq === expected,
      "one backoff per failed attempt, on the deterministic schedule")
  }

  test("per-host politeness: a host's URLs land in one partition") {
    val urls = (1 to 40).map(i => s"http://h${i % 4}.test/p$i").toDF("url")
    val parts = Fetch.harvest(urls, "url",
      new FlakyTransport("host1", Map.empty), FetchPolicy(1), noSleep)
      .select(col("host"), spark_partition_id().as("pid"))
      .distinct().groupBy("host").count().collect()
    assert(parts.length === 4)
    parts.foreach(r => assert(r.getLong(1) === 1L,
      s"host ${r.getString(0)} spread over ${r.getLong(1)} partitions"))
  }

  test("resumable waves: ok skipped, failures retried, ledger accretes") {
    val dir = java.nio.file.Files.createTempDirectory("fetch-ledger").toString
    val urls = Seq("http://r.test/ok", "http://r.test/flaky").toDF("url")
    // wave 1: flaky fails terminally (needs 4 successes > 3 attempts)
    val t1 = new FlakyTransport("wave1", Map("http://r.test/flaky" -> 99))
    val l1 = Fetch.harvestResumable(spark, urls, "url", dir, t1,
      FetchPolicy(maxAttempts = 3, baseBackoffMs = 1), noSleep)
    assert(l1.count() === 2)
    assert(l1.filter(col("status") === "failed").count() === 1)
    // wave 2: fresh transport that now succeeds — only flaky refetched
    val t2 = new FlakyTransport("wave2", Map.empty)
    val l2 = Fetch.harvestResumable(spark, urls, "url", dir, t2,
      FetchPolicy(maxAttempts = 3, baseBackoffMs = 1), noSleep)
    assert(l2.count() === 3, "wave 2 appends exactly the retried URL")
    assert(FetchSpec.counters.keySet().stream()
      .filter(k => k.startsWith("wave2|")).count() === 1,
      "already-ok URL must not be refetched in wave 2")
    assert(l2.filter(col("url") === "http://r.test/flaky" &&
      col("status") === "ok").count() === 1)
    // and the pending set is now empty
    val l3 = spark.read.parquet(dir)
    assert(Fetch.pending(urls, l3, "url").count() === 0)
  }

  test("HttpTransport status-code semantics against an in-process server") {
    // zero-egress: the JDK's built-in HttpServer on 127.0.0.1, an
    // ephemeral port — the production class exercised end to end
    // through the harvest loop, not just unit-poked
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
        body: Array[Byte]): Unit = {
      if (body.isEmpty) ex.sendResponseHeaders(code, -1)
      else {
        ex.sendResponseHeaders(code, body.length)
        ex.getResponseBody.write(body)
      }
      ex.close()
    }
    val empty = Array.empty[Byte]
    server.createContext("/ok",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        respond(ex, 200, "hola".getBytes("UTF-8")))
    server.createContext("/missing",
      (ex: com.sun.net.httpserver.HttpExchange) => respond(ex, 404, empty))
    server.createContext("/flaky",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val n = FetchSpec.httpHits.merge("/flaky", Integer.valueOf(1),
          ((a: Integer, b: Integer) => Integer.valueOf(a + b)):
            java.util.function.BiFunction[Integer, Integer, Integer])
        if (n <= 2) respond(ex, 503, empty)
        else respond(ex, 200, "fixed".getBytes("UTF-8"))
      })
    server.createContext("/limited",
      (ex: com.sun.net.httpserver.HttpExchange) => respond(ex, 429, empty))
    server.createContext("/moved",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getResponseHeaders.add("Location", "/ok")
        respond(ex, 301, empty)
      })
    server.start()
    try {
      FetchSpec.httpHits.clear()
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val urls = Seq(s"$base/ok", s"$base/missing", s"$base/flaky",
        s"$base/limited", s"$base/moved").toDF("url")
      val ledger = Fetch.harvest(urls, "url", new Fetch.HttpTransport(),
        FetchPolicy(maxAttempts = 3, baseBackoffMs = 1), noSleep).collect()
      val byPath = ledger.map(r => r.getString(0).stripPrefix(base) ->
        (r.getString(2), r.getInt(3), r.getString(6),
          Option(r.getAs[Array[Byte]]("content"))
            .map(new String(_, "UTF-8")).orNull)).toMap
      assert(byPath("/ok") === (("ok", 1, null, "hola")))
      assert(byPath("/missing")._1 === "failed" &&
        byPath("/missing")._2 === 1 &&
        byPath("/missing")._3.contains("HTTP 404"),
        s"4xx is TERMINAL — one attempt, no retries: ${byPath("/missing")}")
      assert(byPath("/flaky") === (("ok", 3, null, "fixed")),
        "5xx is transient — two 503s retried, third attempt succeeds")
      assert(byPath("/limited")._1 === "failed" &&
        byPath("/limited")._2 === 3 &&
        byPath("/limited")._3.contains("HTTP 429"),
        s"429 is transient — all attempts spent: ${byPath("/limited")}")
      assert(byPath("/moved") === (("ok", 1, null, "hola")),
        "3xx followed transparently under the NORMAL redirect policy")
    } finally server.stop(0)
  }

  test("HttpTransport: request timeout is transient; malformed URL terminal") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.createContext("/slow",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        Thread.sleep(500)
        ex.sendResponseHeaders(200, -1); ex.close()
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val t = new Fetch.HttpTransport(requestTimeoutMs = 100)
      val row = Fetch.harvest(Seq(s"$base/slow").toDF("url"), "url", t,
        FetchPolicy(maxAttempts = 2, baseBackoffMs = 1), noSleep).head()
      assert(row.getString(2) === "failed" && row.getInt(3) === 2,
        "a timeout burns the full retry budget (transient)")
      val bad = Fetch.harvest(Seq("no-scheme-here").toDF("url"), "url", t,
        FetchPolicy(maxAttempts = 3, baseBackoffMs = 1), noSleep).head()
      assert(bad.getString(2) === "failed" && bad.getInt(3) === 1 &&
        bad.getString(6).contains("TerminalFetchException"),
        s"malformed URL refuses on attempt 1: ${bad.getString(6)}")
    } finally server.stop(0)
  }

  test("parseRobots: group selection, longest-prefix match, allow tie-break") {
    val txt =
      """# corpus crawl policy
        |User-agent: *
        |Disallow: /private/
        |Disallow: /tmp
        |Allow: /private/pub/
        |
        |User-agent: graft-harvest
        |Disallow: /heavy/
        |Allow:
        |
        |User-agent: otherbot
        |Disallow: /
        |""".stripMargin
    // the specific group wins outright — * rules are NOT merged in
    val mine = Fetch.parseRobots(txt, "graft-harvest/1.0")
    assert(mine.allows("/private/anything"), "the * group must not apply")
    assert(!mine.allows("/heavy/file.pdf"))
    assert(mine.allows("/heavy") && mine.allows("/anything"))
    // fallback to * when no specific group matches
    val generic = Fetch.parseRobots(txt, "somebody-else")
    assert(!generic.allows("/private/secret.html"))
    assert(generic.allows("/private/pub/data.csv"),
      "longest prefix wins: Allow /private/pub/ beats Disallow /private/")
    assert(!generic.allows("/tmpfile"), "prefix match, not path-segment match")
    assert(generic.allows("/public/x"))
    // otherbot: everything denied
    assert(!Fetch.parseRobots(txt, "otherbot").allows("/"))
    // empty/absent robots: everything allowed
    assert(Fetch.parseRobots("", "graft-harvest").allows("/anything"))
    // crawl-delay: group-scoped, seconds (fractional), specific wins
    val delayed =
      """User-agent: *
        |Crawl-delay: 10
        |Disallow: /x
        |
        |User-agent: graft-harvest
        |Crawl-delay: 1.5
        |""".stripMargin
    assert(Fetch.parseRobots(delayed, "graft-harvest").crawlDelayMs ===
      Some(1500L))
    assert(Fetch.parseRobots(delayed, "otherbot").crawlDelayMs ===
      Some(10000L))
    assert(Fetch.parseRobots("User-agent: *\nDisallow:\n",
      "graft-harvest").crawlDelayMs === None)
  }

  test("parseRobots: only the single most specific group applies (RFC 9309 §2.2.1)") {
    // a less-specific-but-matching group's Allow must NOT win the
    // equal-length-prefix tie against the specific group's Disallow
    val txt =
      """User-agent: graft
        |Allow: /private/
        |Crawl-delay: 9
        |
        |User-agent: graft-harvest
        |Disallow: /private/
        |Crawl-delay: 2
        |
        |User-agent: *
        |Allow: /
        |""".stripMargin
    val r = Fetch.parseRobots(txt, "graft-harvest/1.0")
    assert(!r.allows("/private/doc.html"),
      "the 'graft' group's Allow must not be merged into the " +
        "'graft-harvest' group's rules")
    assert(r.crawlDelayMs === Some(2000L),
      "crawl-delay comes from the winning group only")
    // the shorter token still wins for an agent only IT matches
    val r2 = Fetch.parseRobots(txt, "graft-fetcher/1.0")
    assert(r2.allows("/private/doc.html") && r2.crawlDelayMs === Some(9000L))
    // groups repeating the SAME winning token combine
    val dup =
      """User-agent: graft-harvest
        |Disallow: /a/
        |
        |User-agent: graft-harvest
        |Disallow: /b/
        |""".stripMargin
    val r3 = Fetch.parseRobots(dup, "graft-harvest")
    assert(!r3.allows("/a/x") && !r3.allows("/b/x") && r3.allows("/c/x"))
  }

  test("robots gating matches path plus query string") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
        body: Array[Byte]): Unit = {
      if (body.isEmpty) ex.sendResponseHeaders(code, -1)
      else { ex.sendResponseHeaders(code, body.length); ex.getResponseBody.write(body) }
      ex.close()
    }
    server.createContext("/robots.txt",
      (ex: com.sun.net.httpserver.HttpExchange) => respond(ex, 200,
        "User-agent: *\nDisallow: /search?q=\n".getBytes("UTF-8")))
    server.createContext("/search",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        respond(ex, 200, "results".getBytes("UTF-8")))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val urls = Seq(s"$base/search?q=secret", s"$base/search").toDF("url")
      val ledger = Fetch.harvest(urls, "url", new Fetch.HttpTransport(),
        FetchPolicy(maxAttempts = 1, respectRobots = true), noSleep)
        .collect()
      val byUrl = ledger.map(r => r.getString(0).stripPrefix(base) ->
        r.getString(2)).toMap
      assert(byUrl("/search?q=secret") === "denied",
        "query-targeting rules must gate query-carrying URLs")
      assert(byUrl("/search") === "ok")
    } finally server.stop(0)
  }

  test("unreachable robots.txt (5xx) disallows the whole host; 404 allows") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.createContext("/robots.txt",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.sendResponseHeaders(503, -1); ex.close()
      })
    server.createContext("/doc",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val b = "x".getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val urls = Seq(s"$base/doc").toDF("url")
      val row = Fetch.harvest(urls, "url", new Fetch.HttpTransport(),
        FetchPolicy(maxAttempts = 1, respectRobots = true), noSleep).head()
      assert(row.getString(2) === "denied",
        "RFC 9309 §2.3.1.4: unreachable robots = complete disallow")
    } finally server.stop(0)
    // 404 robots (no context registered) = unrestricted (§2.3.1.3)
    val open = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    open.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(2))
    open.createContext("/doc",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val b = "y".getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      })
    open.start()
    try {
      val base = s"http://127.0.0.1:${open.getAddress.getPort}"
      val row = Fetch.harvest(Seq(s"$base/doc").toDF("url"), "url",
        new Fetch.HttpTransport(),
        FetchPolicy(maxAttempts = 1, respectRobots = true), noSleep).head()
      assert(row.getString(2) === "ok")
    } finally open.stop(0)
  }

  test("a hostile Crawl-delay is clamped to maxGapMs and flagged in the ledger") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.createContext("/robots.txt",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        // a day between requests: taken literally this stalls the
        // host's whole partition — the policy ceiling must apply
        val b = "User-agent: *\nCrawl-delay: 86400\n".getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      })
    server.createContext("/doc",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val b = "x".getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      })
    server.start()
    try {
      FetchSpec.sleeps.clear()
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val urls = Seq(s"$base/doc?a", s"$base/doc?b").toDF("url")
      val recorder: Long => Unit = ms => { FetchSpec.sleeps.add(ms); () }
      val ledger = Fetch.harvest(urls, "url", new Fetch.HttpTransport(),
        FetchPolicy(maxAttempts = 1, respectRobots = true,
          maxGapMs = 1500L), recorder)
        .collect()
      assert(ledger.forall(_.getString(2) == "ok"),
        "clamping must not deny the host")
      assert(ledger.forall(_.getAs[Boolean]("gap_clamped")),
        "rows fetched under a clamped gap carry the audit flag")
      val waits = FetchSpec.sleeps.toArray(Array.empty[java.lang.Long])
      assert(waits.length === 1 && waits.head <= 1500L,
        s"the scheduled gap must be the CLAMPED one: ${waits.mkString(",")}")
    } finally server.stop(0)
  }

  test("robots Crawl-delay raises the per-host politeness gap") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.createContext("/robots.txt",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val b = "User-agent: *\nCrawl-delay: 2\n".getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      })
    server.createContext("/doc",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val b = "x".getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      })
    server.start()
    try {
      FetchSpec.sleeps.clear()
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val urls = Seq(s"$base/doc?a", s"$base/doc?b").toDF("url")
      val recorder: Long => Unit = ms => { FetchSpec.sleeps.add(ms); () }
      val ledger = Fetch.harvest(urls, "url", new Fetch.HttpTransport(),
        FetchPolicy(maxAttempts = 1, respectRobots = true), recorder)
        .collect()
      assert(ledger.forall(_.getString(2) == "ok"))
      // the SECOND same-host request must wait out the 2 s crawl
      // delay (minus the first request's own elapsed time)
      val waits = FetchSpec.sleeps.toArray(Array.empty[java.lang.Long])
      assert(waits.length === 1 && waits.head >= 1000L &&
        waits.head <= 2000L,
        s"crawl-delay gap must be scheduled: ${waits.mkString(",")}")
    } finally server.stop(0)
  }

  test("robots gating: disallowed URLs record 'denied' with zero attempts; unfetchable robots allows") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
        body: Array[Byte]): Unit = {
      if (body.isEmpty) ex.sendResponseHeaders(code, -1)
      else { ex.sendResponseHeaders(code, body.length); ex.getResponseBody.write(body) }
      ex.close()
    }
    server.createContext("/robots.txt",
      (ex: com.sun.net.httpserver.HttpExchange) => respond(ex, 200,
        "User-agent: *\nDisallow: /blocked/\n".getBytes("UTF-8")))
    server.createContext("/blocked/",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        FetchSpec.httpHits.merge("/blocked", Integer.valueOf(1),
          ((a: Integer, b: Integer) => Integer.valueOf(a + b)):
            java.util.function.BiFunction[Integer, Integer, Integer])
        respond(ex, 200, "secret".getBytes("UTF-8"))
      })
    server.createContext("/open/",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        respond(ex, 200, "public".getBytes("UTF-8")))
    server.start()
    try {
      FetchSpec.httpHits.clear()
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val urls = Seq(s"$base/blocked/doc.html", s"$base/open/doc.html").toDF("url")
      val ledger = Fetch.harvest(urls, "url", new Fetch.HttpTransport(),
        FetchPolicy(maxAttempts = 3, baseBackoffMs = 1, respectRobots = true),
        noSleep).collect()
      val byPath = ledger.map(r => r.getString(0).stripPrefix(base) ->
        ((r.getString(2), r.getInt(3), r.getString(6)))).toMap
      assert(byPath(s"/blocked/doc.html") ===
        (("denied", 0, "robots.txt disallow")))
      assert(byPath(s"/open/doc.html")._1 === "ok")
      assert(FetchSpec.httpHits.getOrDefault("/blocked", 0) === 0,
        "a denied URL must never be requested")
      // a denied row is NOT 'ok' — it stays in the pending set, so a
      // future robots relaxation is picked up on the next wave
      val ld = spark.createDataFrame(
        spark.sparkContext.parallelize(ledger.toSeq), ledger.head.schema)
      assert(Fetch.pending(urls, ld, "url").count() === 1)
    } finally server.stop(0)
  }

  test("conditional recrawl: 304 keeps prior bytes, changed bodies refetch; resolveLatest re-attaches") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    def serveVersioned(path: String, tag: String, body: String): Unit =
      server.createContext(path,
        (ex: com.sun.net.httpserver.HttpExchange) => {
          val inm = ex.getRequestHeaders.getFirst("If-None-Match")
          if (inm != null && inm == tag) {
            FetchSpec.httpHits.merge(s"304$path", Integer.valueOf(1),
              ((a: Integer, b: Integer) => Integer.valueOf(a + b)):
                java.util.function.BiFunction[Integer, Integer, Integer])
            ex.sendResponseHeaders(304, -1); ex.close()
          } else {
            val b = body.getBytes("UTF-8")
            ex.getResponseHeaders.add("ETag", tag)
            ex.getResponseHeaders.add("Last-Modified",
              "Mon, 01 Jan 2024 00:00:00 GMT")
            ex.sendResponseHeaders(200, b.length)
            ex.getResponseBody.write(b); ex.close()
          }
        })
    serveVersioned("/stable", "\"v1\"", "stable body")
    server.start()
    val dir = java.nio.file.Files.createTempDirectory("fetch-recrawl").toString
    try {
      FetchSpec.httpHits.clear()
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val urls = Seq(s"$base/stable").toDF("url")
      val t = new Fetch.HttpTransport()
      val pol = FetchPolicy(maxAttempts = 2, baseBackoffMs = 1)
      // wave 0: full download, validators recorded in the ledger
      val l0 = Fetch.harvestResumable(spark, urls, "url", dir, t, pol, noSleep)
      val r0 = l0.head()
      assert(r0.getAs[String]("etag") === "\"v1\"" &&
        !r0.getAs[Boolean]("not_modified") &&
        r0.getAs[Array[Byte]]("content") != null)
      // wave 1 recrawl: the origin answers 304 — no bytes transferred
      val l1 = Fetch.recrawlResumable(spark, urls, "url", dir, t, pol, noSleep)
      assert(l1.count() === 2, "recrawl appends one row per url")
      val w1 = l1.filter(col("wave") === 1).head()
      assert(w1.getAs[String]("status") === "ok" &&
        w1.getAs[Boolean]("not_modified") &&
        w1.getAs[Array[Byte]]("content") == null &&
        w1.getAs[String]("content_sha256") === r0.getAs[String]("content_sha256"),
        "304 rows carry sha/size but no payload")
      assert(FetchSpec.httpHits.getOrDefault("304/stable", 0) === 1,
        "the conditional request must actually hit the 304 path")
      // resolveLatest: the newest ok row wins AND carries real bytes
      val resolved = Fetch.resolveLatest(l1).collect()
      assert(resolved.length === 1)
      assert(resolved.head.getAs[Int]("wave") === 1)
      assert(new String(resolved.head.getAs[Array[Byte]]("content"),
        "UTF-8") === "stable body",
        "not_modified winners re-attach bytes from the downloading wave")
    } finally {
      server.stop(0)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("file transport round-trips local bytes") {
    val f = java.nio.file.Files.createTempFile("fetch", ".bin")
    java.nio.file.Files.write(f, Array[Byte](1, 2, 3))
    assert(Fetch.FileTransport.fetch(f.toString).toSeq === Seq[Byte](1, 2, 3))
    assert(Fetch.FileTransport.fetch(f.toUri.toString).toSeq === Seq[Byte](1, 2, 3))
  }
}

object FetchSpec {
  val counters = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  val sleeps = new ConcurrentLinkedQueue[Long]()
  val httpHits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Fails each URL `failures(url)` times, then succeeds with the
    * URL's bytes. Lives in the companion (no `$outer` — the suite
    * itself isn't serializable); attempt counts survive the task
    * closure round-trip via the static map, keyed by a test-unique
    * tag (local[..] = one JVM). */
  class FlakyTransport(tag: String, failures: Map[String, Int])
      extends FetchTransport {
    override def fetch(url: String): Array[Byte] = {
      val k = s"$tag|$url"
      val n: Int = FetchSpec.counters.merge(k, Integer.valueOf(1),
        ((a: Integer, b: Integer) => Integer.valueOf(a + b)): java.util.function.BiFunction[Integer, Integer, Integer])
      if (n <= failures.getOrElse(url, 0))
        throw new java.io.IOException(s"transient #$n")
      s"payload:$url".getBytes("UTF-8")
    }
  }
}
