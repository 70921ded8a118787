package graft.sources

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resilient distributed fetch loop — the harvest side of S11/S12.
  *
  * The reference's most-exercised entry point is its ingestion
  * manager + per-source drivers: sequential `requests.get` with a
  * timeout, fallback across candidate URLs, and raw bytes landed in
  * bronze with a content id (/root/reference/pipeline/ingestion/
  * drivers/driver_bible.py:24-66, pipeline/ingestion/manager.py:17-47).
  * That loop is single-process and stops at the first driver
  * exception; at crawl scale (millions of URLs) the engine needs the
  * same semantics distributed, resumable, and polite.
  *
  * Spark-first shape:
  *  - the URL list is a DataFrame; distinct URLs are REPARTITIONED BY
  *    HOST so each host's requests run sequentially inside one task
  *    (politeness: a 1000-executor fleet never hammers one origin from
  *    a thousand sockets) while distinct hosts fan out cluster-wide;
  *  - per URL, a bounded attempt loop with exponential backoff and
  *    DETERMINISTIC "equal jitter" (AWS architecture-blog variant:
  *    half fixed, half hash-derived) — jitter from a seeded hash, not
  *    `Random`, so a re-run retries on the identical schedule and
  *    tests can pin it;
  *  - every outcome (success OR terminal failure) becomes a LEDGER row
  *    — payload bytes, content sha-256, attempt count, error string —
  *    so a harvest is a dataset, not a log file;
  *  - [[harvestResumable]] appends ledger waves under one directory:
  *    already-`ok` URLs are anti-joined away, prior FAILURES are
  *    retried next wave. Crash mid-wave loses only in-flight tasks.
  *
  * The transport is injected ([[FetchTransport]]) — a java.net.http
  * client slots in where egress exists; CI (zero-egress) exercises the
  * loop with the file transport and scripted fakes (FetchSpec), the
  * same seam JdbcSpec uses for S9's retry path. Fetched bytes compose
  * with the S13 bronze sink (`Multimodal`/`CorpusIO`) and the wave
  * ingestion CLIs downstream.
  */
object Fetch {

  /** One fetch attempt. Implementations throw on transient failure
    * (timeout, 5xx, reset); the harvest loop owns retries. A failure
    * retrying cannot fix (HTTP 4xx, malformed URL) throws
    * [[TerminalFetchException]] — the loop records it immediately and
    * spends no further attempts. Must be serializable — instances
    * ship to executors. */
  trait FetchTransport extends Serializable {
    def fetch(url: String): Array[Byte]

    /** Conditional fetch for recrawl waves: pass the prior wave's
      * validators and get `notModified = true` (body null) when the
      * origin answers 304. The default ignores validators — scripted
      * fake transports keep working unchanged; [[HttpTransport]]
      * sends real If-None-Match / If-Modified-Since headers. */
    def fetchValidated(url: String, etag: String,
        lastModified: String): FetchResult =
      FetchResult(fetch(url), null, null, notModified = false)
  }

  /** One transport exchange: payload plus the cache validators the
    * origin returned (either may be null). `notModified` marks a 304
    * short-circuit — body is null and the caller keeps prior bytes. */
  final case class FetchResult(body: Array[Byte], etag: String,
      lastModified: String, notModified: Boolean)

  /** A failure no retry can fix — the harvest loop stops attempting
    * this URL in this wave and writes the failed ledger row at once. */
  final class TerminalFetchException(msg: String)
    extends RuntimeException(msg)

  /** Production transport over `java.net.http` — the reference's
    * `requests.get(url, timeout=...)` contract
    * (/root/reference/pipeline/ingestion/drivers/driver_bible.py:24-36)
    * with the status-code semantics a crawl needs spelled out:
    *  - 2xx → body bytes;
    *  - 3xx → followed transparently up to the client's NORMAL
    *    redirect policy (follows across hosts, but never downgrades
    *    https → http);
    *  - 408 (request timeout) and 429 (rate limited) → TRANSIENT
    *    (plain IOException; the loop backs off and retries — exactly
    *    the two 4xx codes that are retryable by definition);
    *  - any other 4xx → TERMINAL (a retry cannot turn a 404 into a
    *    200; burning attempts on it is impolite and slow);
    *  - 5xx, connect/read timeout, reset → transient.
    * One client per executor JVM (`@transient lazy` — HttpClient is
    * thread-safe and pools connections); the per-request timeout is
    * the constructor's, covering the full exchange. Zero-egress CI
    * exercises this class against an in-process localhost stub
    * (FetchSpec); the scripted-fake transports cover the loop. */
  final class HttpTransport(
      connectTimeoutMs: Long = 10_000L,
      requestTimeoutMs: Long = 30_000L,
      userAgent: String = "graft-harvest/1.0") extends FetchTransport {
    @transient private lazy val client: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
        .build()

    override def fetch(url: String): Array[Byte] =
      fetchValidated(url, null, null).body

    override def fetchValidated(url: String, etag: String,
        lastModified: String): FetchResult = {
      // URI.create AND newBuilder both throw IllegalArgumentException
      // on malformed / scheme-less input — terminal either way
      val req =
        try {
          val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
            .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
            .header("User-Agent", userAgent)
          if (etag != null) b.header("If-None-Match", etag)
          if (lastModified != null) b.header("If-Modified-Since", lastModified)
          b.GET().build()
        }
        catch { case e: IllegalArgumentException =>
          throw new TerminalFetchException(s"malformed URL: ${e.getMessage}") }
      // send throws HttpTimeoutException / IOException on transport
      // failure — transient by the trait's contract
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      def hdr(name: String): String =
        resp.headers().firstValue(name).orElse(null)
      resp.statusCode() match {
        case 304 =>
          // validators held: keep the prior bytes (recrawl waves
          // never re-download unchanged bodies)
          FetchResult(null, etag, lastModified, notModified = true)
        case ok if ok / 100 == 2 =>
          FetchResult(resp.body(), hdr("ETag"), hdr("Last-Modified"),
            notModified = false)
        case 408 | 429 =>
          throw new java.io.IOException(s"HTTP ${resp.statusCode()} (transient)")
        case terminal if terminal / 100 == 4 =>
          throw new TerminalFetchException(s"HTTP $terminal")
        // a 3xx SURFACING here means the client refused to follow it
        // (missing Location, or a redirect the NORMAL policy rejects,
        // e.g. an https→http downgrade) — permanently unfollowable,
        // so terminal: retrying with backoff cannot change the
        // server's redirect and would burn the whole attempt budget
        case redirect if redirect / 100 == 3 =>
          throw new TerminalFetchException(s"HTTP $redirect (unfollowable redirect)")
        case other =>
          throw new java.io.IOException(s"HTTP $other")
      }
    }
  }

  /** `file:` URIs and plain paths — the transport local corpus
    * mirrors and CI use. */
  object FileTransport extends FetchTransport {
    override def fetch(url: String): Array[Byte] = {
      val path =
        if (url.startsWith("file:")) java.nio.file.Paths.get(java.net.URI.create(url))
        else java.nio.file.Paths.get(url)
      java.nio.file.Files.readAllBytes(path)
    }
  }

  /** @param maxAttempts   total tries per URL per wave (reference
    *                      drivers: one; production crawls: 3-5)
    * @param baseBackoffMs first-retry backoff before jitter
    * @param maxBackoffMs  backoff ceiling (caps the exponential)
    * @param minGapMs      politeness floor between CONSECUTIVE
    *                      requests to the same host within a task
    * @param maxGapMs      per-host gap CEILING — a robots Crawl-delay
    *                      is honored only up to this bound. All of a
    *                      host's URLs live in one task by design, so
    *                      an uncapped hostile/typo'd `Crawl-delay:
    *                      86400` would stall the whole partition for
    *                      a day per request (a self-DoS / straggler
    *                      vector at fleet scale). Clamped rows land
    *                      with `gap_clamped = true` so the audit line
    *                      can count affected hosts.
    * @param jitterSeed    seed for the deterministic jitter hash */
  final case class FetchPolicy(
      maxAttempts: Int = 3,
      baseBackoffMs: Long = 250L,
      maxBackoffMs: Long = 10_000L,
      minGapMs: Long = 0L,
      maxGapMs: Long = 5_000L,
      jitterSeed: Long = 42L,
      respectRobots: Boolean = false,
      robotsAgent: String = "graft-harvest") {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    require(baseBackoffMs >= 0 && maxBackoffMs >= baseBackoffMs, "bad backoff bounds")
    require(maxGapMs >= minGapMs, "maxGapMs must be >= minGapMs")
  }

  /** Ledger row. `status` is `ok`, `failed`, or `denied` (robots);
    * `content` is null on failure/denial AND on a 304 short-circuit
    * (`not_modified = true` — sha/size copied from the prior wave, so
    * bytes are resolved via [[resolveLatest]] without re-shipping
    * them through the fetch shuffle). `etag`/`last_modified` are the
    * origin's cache validators for the next recrawl wave; `wave`
    * orders a multi-wave ledger (newest wins); `gap_clamped` marks
    * rows whose host asked for a robots Crawl-delay above the
    * policy's `maxGapMs` ceiling (the clamped gap was used). */
  final case class FetchRecord(
      url: String, host: String, status: String, attempts: Int,
      n_bytes: Long, content_sha256: String, error: String,
      content: Array[Byte],
      etag: String = null, last_modified: String = null,
      not_modified: Boolean = false, wave: Int = 0,
      gap_clamped: Boolean = false)

  /** Deterministic equal-jitter backoff before attempt `attempt + 1`
    * (so `attempt` = how many have failed): half the exponential step
    * fixed, half hash-derived from (url, attempt, seed). */
  def backoffMs(policy: FetchPolicy, url: String, attempt: Int): Long = {
    val expo = math.min(policy.maxBackoffMs,
      policy.baseBackoffMs << math.min(attempt - 1, 20))
    if (expo <= 1) expo
    else {
      val h = scala.util.hashing.MurmurHash3.stringHash(
        s"$url#$attempt", policy.jitterSeed.toInt)
      val half = expo / 2
      half + (math.floorMod(h.toLong, half + 1))
    }
  }

  private def hostOf(url: String): String =
    try {
      val h = java.net.URI.create(url).getHost
      if (h == null) "" else h.toLowerCase
    } catch { case _: Exception => "" }

  // ---- robots.txt (opt-in politeness gate) ----

  /** Parsed robots rules: (path-prefix, allow) pairs from the groups
    * addressing our agent. Longest-prefix match wins; an allow wins a
    * same-length tie (Google's published tie-break); no match =
    * allowed. */
  private[graft] final case class RobotsRules(
      rules: Vector[(String, Boolean)],
      crawlDelayMs: Option[Long] = None) {
    def allows(path: String): Boolean = {
      val p = if (path == null || path.isEmpty) "/" else path
      var bestLen = -1
      var bestAllow = true
      rules.foreach { case (prefix, allow) =>
        if (p.startsWith(prefix) &&
            (prefix.length > bestLen ||
              (prefix.length == bestLen && allow))) {
          bestLen = prefix.length
          bestAllow = allow
        }
      }
      bestAllow
    }
  }

  /** Minimal robots.txt parser (RFC 9309 shape): consecutive
    * `User-agent` lines open a group; `Allow`/`Disallow` lines fill
    * it; the SINGLE most specific agent match wins (RFC 9309 §2.2.1 —
    * the longest agent token contained in `agent`; groups repeating
    * that same winning token combine, everything less specific —
    * including `*` — is ignored, never merged). Empty Disallow means
    * allow-everything (no rule). `Crawl-delay` (the de-facto
    * extension) is parsed group-scoped and honored as the per-host
    * gap, clamped to `FetchPolicy.maxGapMs`; `Sitemap` directives are
    * group-independent and handled separately
    * ([[graft.functions.web.robots_sitemap_locs]] /
    * [[sitemapSeedsFromRobots]]); other unknown directives are
    * ignored. */
  private[graft] def parseRobots(txt: String, agent: String): RobotsRules = {
    val agentLc = agent.toLowerCase
    var groups = Vector.empty[(Vector[String], Vector[(String, Boolean)],
      Option[Long])]
    var curAgents = Vector.empty[String]
    var curRules = Vector.empty[(String, Boolean)]
    var curDelay: Option[Long] = None
    var inRules = false
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups :+= ((curAgents, curRules, curDelay))
      curAgents = Vector.empty; curRules = Vector.empty
      curDelay = None; inRules = false
    }
    txt.linesIterator.foreach { line0 =>
      val line = line0.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) flush()
            curAgents :+= value.toLowerCase
          case "disallow" | "allow" if curAgents.nonEmpty =>
            inRules = true
            if (value.nonEmpty) curRules :+= ((value, key == "allow"))
          // the de-facto extension big origins still serve: seconds
          // (fractional allowed) between requests; group-scoped like
          // Allow/Disallow
          case "crawl-delay" if curAgents.nonEmpty =>
            inRules = true
            curDelay = value.toDoubleOption.filter(_ >= 0)
              .map(d => (d * 1000).toLong)
          case _ => ()
        }
      }
    }
    flush()
    // RFC 9309 §2.2.1: obey only the MOST specific matching group —
    // the longest agent token our product token contains. Merging
    // every matching group lets an Allow from a less-specific group
    // win the equal-length-prefix tie against the specific group's
    // Disallow, crawling paths the origin denied us.
    def matchLen(as: Vector[String]): Int =
      as.iterator.filter(a => a != "*" && agentLc.contains(a))
        .map(_.length).maxOption.getOrElse(-1)
    val best = groups.iterator.map(g => matchLen(g._1))
      .maxOption.getOrElse(-1)
    val chosen =
      if (best > 0) groups.filter(g => matchLen(g._1) == best)
      else groups.filter(_._1.contains("*"))
    RobotsRules(chosen.flatMap(_._2),
      chosen.flatMap(_._3).reduceOption(_ max _))
  }

  private def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Fetch every distinct URL once, host-partitioned, with the policy's
    * retry loop. Returns the ledger (one row per URL — `ok` rows carry
    * payload + sha, `failed` rows the last error and attempt count).
    * `sleeper` is the backoff/politeness clock — injectable so specs
    * assert the schedule instead of sleeping through it.
    *
    * AT-LEAST-ONCE: the fetch is a side effect inside a lazily
    * re-computable plan — a downstream `orderBy` (range-partitioner
    * sampling pass), a task retry, or speculation re-runs it. Land the
    * ledger with ONE terminal write before any multi-pass consumption
    * ([[harvestResumable]] does exactly this); origins see at-least-
    * once requests, the ledger itself stays one-row-per-URL. */
  /** Per-URL work item: the URL plus the prior wave's validators
    * (null when no prior `ok` row exists — an unconditional fetch).
    * Public only because Catalyst's generated deserializer must
    * instantiate it — not API. */
  final case class WorkItem(url: String, v_etag: String,
      v_last_modified: String, v_sha: String, v_bytes: Long)

  def harvest(
      urls: DataFrame, urlCol: String, transport: FetchTransport,
      policy: FetchPolicy = FetchPolicy(),
      sleeper: Long => Unit = Thread.sleep,
      validators: DataFrame = null,
      wave: Int = 0): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val base = urls.select(col(urlCol).cast("string").as("url"))
      .filter(col("url").isNotNull).distinct()
    // validators ride the same (small: url + two header strings + a
    // hash) work list — the prior wave's BYTES never enter the fetch
    // shuffle; a 304 row carries sha/size only and resolveLatest
    // re-attaches content from the wave that downloaded it
    val withV = Option(validators) match {
      case Some(v) => base.join(
        v.select(col("url"), col("etag").as("v_etag"),
          col("last_modified").as("v_last_modified"),
          col("content_sha256").as("v_sha"),
          coalesce(col("n_bytes"), lit(0L)).as("v_bytes")),
        Seq("url"), "left")
        .withColumn("v_bytes", coalesce(col("v_bytes"), lit(0L)))
      case None => base
        .withColumn("v_etag", lit(null: String))
        .withColumn("v_last_modified", lit(null: String))
        .withColumn("v_sha", lit(null: String))
        .withColumn("v_bytes", lit(0L))
    }
    val work = withV
      // all URLs of a host into ONE task ⇒ per-host serial politeness;
      // hosts spread across the cluster
      .repartition(hostColumn(col("url")))
      .as[WorkItem]
    work.mapPartitions { it =>
      var lastHost: String = null
      var lastAt = 0L
      // one robots.txt fetch per host per task (hosts are partition-
      // local, so effectively once per host per wave). RFC 9309 error
      // semantics: UNAVAILABLE (4xx, missing file) = unrestricted
      // (§2.3.1.3); UNREACHABLE (5xx, network failure) = complete
      // disallow (§2.3.1.4) — a flapping origin must make the wave
      // back off the whole host, not crawl it ungated.
      val robotsCache = scala.collection.mutable.HashMap
        .empty[String, RobotsRules]
      def robotsFor(url: String, host: String): RobotsRules =
        robotsCache.getOrElseUpdate(host, {
          val txt = try {
            val u = java.net.URI.create(url)
            new String(
              transport.fetch(s"${u.getScheme}://${u.getRawAuthority}/robots.txt"),
              java.nio.charset.StandardCharsets.UTF_8)
          } catch {
            // 4xx (HttpTransport) / missing local file: unavailable
            case _: TerminalFetchException => ""
            case _: java.nio.file.NoSuchFileException => ""
            case _: java.io.FileNotFoundException => ""
            // 5xx, timeouts, refused connections: unreachable
            case scala.util.control.NonFatal(_) =>
              "User-agent: *\nDisallow: /\n"
          }
          parseRobots(txt, policy.robotsAgent)
        })
      it.map { w =>
        val url = w.url
        val host = hostOf(url)
        val rulesOpt =
          if (policy.respectRobots && host.nonEmpty)
            Some(robotsFor(url, host))
          else None
        if (rulesOpt.exists { rules =>
          // match on path PLUS query — robots rules like
          // `Disallow: /search?q=` must gate query-carrying URLs
          val path =
            try {
              val u = java.net.URI.create(url)
              val p = Option(u.getRawPath).filter(_.nonEmpty).getOrElse("/")
              val q = u.getRawQuery
              if (q == null) p else s"$p?$q"
            } catch { case _: Exception => "/" }
          !rules.allows(path)
        }) {
          // denied rows spend ZERO request attempts on the document
          // URL and are re-checked next wave (robots files change)
          FetchRecord(url, host, "denied", 0, 0L, null,
            "robots.txt disallow", null, wave = wave)
        } else {
          // per-host gap: the policy floor, raised by the host's
          // robots Crawl-delay when one applies — clamped at the
          // policy ceiling (see FetchPolicy.maxGapMs)
          val askedGapMs = math.max(policy.minGapMs,
            rulesOpt.flatMap(_.crawlDelayMs).getOrElse(0L))
          val gapMs = math.min(policy.maxGapMs, askedGapMs)
          val gapClamped = askedGapMs > policy.maxGapMs
          if (gapMs > 0 && host == lastHost) {
            val wait = lastAt + gapMs - System.nanoTime() / 1000000L
            if (wait > 0) sleeper(wait)
          }
          var attempt = 0
          var result: FetchRecord = null
          while (result == null) {
            attempt += 1
            try {
              val r = transport.fetchValidated(url, w.v_etag,
                w.v_last_modified)
              result =
                if (r.notModified)
                  // 304: validators held — sha/size copied from the
                  // prior wave, bytes resolved there (never re-sent)
                  FetchRecord(url, host, "ok", attempt, w.v_bytes,
                    w.v_sha, null, null, etag = w.v_etag,
                    last_modified = w.v_last_modified,
                    not_modified = true, wave = wave)
                else
                  FetchRecord(url, host, "ok", attempt,
                    r.body.length.toLong, sha256Hex(r.body), null, r.body,
                    etag = r.etag, last_modified = r.lastModified,
                    wave = wave)
            } catch {
              // terminal before the retry guard: a 404 on attempt 1 of 5
              // records immediately — no backoff, no further requests
              case e: TerminalFetchException =>
                result = FetchRecord(url, host, "failed", attempt, 0L, null,
                  s"${e.getClass.getSimpleName}: ${e.getMessage}", null,
                  wave = wave)
              case _: Exception if attempt < policy.maxAttempts =>
                sleeper(backoffMs(policy, url, attempt))
              case e: Exception =>
                result = FetchRecord(url, host, "failed", attempt, 0L, null,
                  s"${e.getClass.getSimpleName}: ${e.getMessage}", null,
                  wave = wave)
            }
          }
          lastHost = host
          lastAt = System.nanoTime() / 1000000L
          if (gapClamped) result.copy(gap_clamped = true) else result
        }
      }
    }.toDF()
  }

  /** Host column for the politeness repartition — `parse_url` is
    * codegen'd; URI-less strings (plain paths) group under ''. */
  private def hostColumn(url: org.apache.spark.sql.Column) =
    lower(coalesce(parse_url(url, lit("HOST")), lit("")))

  /** URLs with no `ok` ledger row yet — the next wave's work list
    * (failures are retried, successes never refetched). */
  def pending(urls: DataFrame, ledger: DataFrame, urlCol: String): DataFrame =
    urls.select(col(urlCol).cast("string").as("url"))
      .filter(col("url").isNotNull).distinct()
      .join(ledger.filter(col("status") === "ok").select("url"),
        Seq("url"), "left_anti")

  /** One resumable harvest wave: fetch what the ledger at `ledgerDir`
    * hasn't succeeded on, append the new rows, return the full updated
    * ledger. Payload bytes live IN the ledger parquet — bronze is one
    * `filter(status = 'ok')` projection away (S13). */
  def harvestResumable(
      spark: SparkSession, urls: DataFrame, urlCol: String,
      ledgerDir: String, transport: FetchTransport,
      policy: FetchPolicy = FetchPolicy(),
      sleeper: Long => Unit = Thread.sleep): DataFrame = {
    // "a ledger exists" = the directory holds at least one data file —
    // a freshly created empty dir must read as no-prior-waves, not as
    // an unreadable parquet source
    val dirPath = java.nio.file.Paths.get(ledgerDir)
    val hasPrior = java.nio.file.Files.isDirectory(dirPath) && {
      val s = java.nio.file.Files.list(dirPath)
      try s.anyMatch(p => {
        val n = p.getFileName.toString
        !n.startsWith(".") && !n.startsWith("_")
      })
      finally s.close()
    }
    val prior = if (hasPrior) Some(readLedger(spark, ledgerDir)) else None
    val todo = prior match {
      case Some(l) => pending(urls, l, urlCol)
      case None => urls.select(col(urlCol).cast("string").as("url"))
        .filter(col("url").isNotNull).distinct()
    }
    val wave = prior.map(nextWave).getOrElse(0)
    harvest(todo, "url", transport, policy, sleeper, wave = wave)
      .write.mode("append").parquet(ledgerDir)
    readLedger(spark, ledgerDir)
  }

  /** One recrawl wave: refetch EVERY url (not just pending ones)
    * CONDITIONALLY — the prior wave's `ETag`/`Last-Modified`
    * validators ride the work list as If-None-Match /
    * If-Modified-Since, and a 304 answer appends an `ok` row carrying
    * sha/size but NO bytes (`not_modified = true`). Unchanged bodies
    * are never re-downloaded and never re-shuffled; [[resolveLatest]]
    * re-attaches content from the wave that fetched it. This is plain
    * HTTP conditional-request caching (RFC 9110 §13.1 If-None-Match /
    * If-Modified-Since); the reference pipeline has no recrawl loop —
    * its drivers refetch unconditionally — so this is an engine
    * extension, not a ported contract. */
  def recrawlResumable(
      spark: SparkSession, urls: DataFrame, urlCol: String,
      ledgerDir: String, transport: FetchTransport,
      policy: FetchPolicy = FetchPolicy(),
      sleeper: Long => Unit = Thread.sleep): DataFrame = {
    val prior = readLedger(spark, ledgerDir)
    val validators = latestOk(prior)
      .select("url", "etag", "last_modified", "content_sha256", "n_bytes")
    val wave = nextWave(prior)
    harvest(urls, urlCol, transport, policy, sleeper,
      validators = validators, wave = wave)
      .write.mode("append").parquet(ledgerDir)
    readLedger(spark, ledgerDir)
  }

  /** Current content per url from a multi-wave ledger: the newest
    * `ok` row wins; a `not_modified` winner takes its bytes from the
    * newest row that actually carried them (same url — the sha is
    * unchanged by the 304 contract). One shuffle on url; bytes cross
    * it once. */
  def resolveLatest(ledger: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUrl = Window.partitionBy("url")
      .orderBy(col("wave").desc, col("attempts").desc)
    val ok = ledger.filter(col("status") === "ok")
    val latest = ok.withColumn("rn", row_number().over(byUrl))
      .filter(col("rn") === 1).drop("rn")
    val bytes = ok.filter(col("content").isNotNull)
      .withColumn("rn", row_number().over(byUrl))
      .filter(col("rn") === 1)
      .select(col("url"), col("content").as("prior_content"))
    latest.join(bytes, Seq("url"), "left")
      .withColumn("content", coalesce(col("content"), col("prior_content")))
      .drop("prior_content")
  }

  /** Ledger read with schema merge — waves written by older engine
    * versions (no etag/wave columns) coexist with new ones. */
  private def readLedger(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(dir)
    val withDefaults = Seq(
      "etag" -> lit(null: String).cast("string"),
      "last_modified" -> lit(null: String).cast("string"),
      "not_modified" -> lit(false),
      "wave" -> lit(0),
      "gap_clamped" -> lit(false))
      .foldLeft(raw) { case (df, (name, default)) =>
        if (df.columns.contains(name)) df
        else df.withColumn(name, default)
      }
    withDefaults
  }

  private def nextWave(ledger: DataFrame): Int =
    ledger.agg(max(col("wave"))).head() match {
      case r if r.isNullAt(0) => 0
      case r => r.getInt(0) + 1
    }

  /** Newest `ok` row per url (validators live here). */
  private def latestOk(ledger: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ledger.filter(col("status") === "ok")
      .withColumn("rn", row_number().over(
        Window.partitionBy("url").orderBy(col("wave").desc)))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Fetched sitemap bytes → XML text: gzip-aware (sitemaps.org
    * allows `.xml.gz`; sniffed by the 1f 8b magic, not the name) and
    * UTF-8 decoded. Byte-level codec work, so it runs in
    * `mapPartitions` like every other codec in the engine; sitemap
    * files are metadata-scale (≤ 50 MB uncompressed each by spec). */
  private def sitemapXmlText(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("url"), col("content")).as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (u, bytes) =>
          val body =
            if (bytes.length > 2 && (bytes(0) & 0xFF) == 0x1F &&
                (bytes(1) & 0xFF) == 0x8B) {
              val in = new java.util.zip.GZIPInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try in.readAllBytes() finally in.close()
            } else bytes
          (u, new String(body, java.nio.charset.StandardCharsets.UTF_8))
        }
      }.toDF("sitemap", "xml")
  }

  /** Crawl-frontier seeds from sitemaps (sitemaps.org protocol; an
    * engine extension — the reference's drivers hardcode their URL
    * lists, pipeline/ingestion/drivers/driver_bible.py:23-26).
    *
    * Each round fetches the current level of sitemap URLs through the
    * SAME politeness-governed distributed harvest as any other crawl
    * (robots gating, Crawl-delay, backoff and the resumable ledger at
    * `ledgerDir` all apply — a re-run re-reads the ledger instead of
    * re-fetching), parses the XML (gzip-sniffed), collects `<url>`
    * entries, and recurses through `<sitemapindex>` children until
    * `maxDepth`. Returns distinct `(url, lastmod, sitemap)` seeds
    * with `url` canonicalized ([[graft.functions.web.canonical_url]])
    * so the frontier dedups across escaped/unsorted-query variants.
    *
    * The per-round frontier is counted against `maxSitemaps` BEFORE
    * fetching and refused loudly when exceeded (an index bomb must
    * not schedule a million fetches); entries stay fully distributed
    * — nothing document-scale ever reaches the driver. */
  def sitemapSeeds(
      spark: SparkSession, sitemapUrls: DataFrame, urlCol: String,
      ledgerDir: String, transport: FetchTransport,
      policy: FetchPolicy = FetchPolicy(), maxDepth: Int = 3,
      maxSitemaps: Long = 100000L,
      sleeper: Long => Unit = Thread.sleep): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("url",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lastmod",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("sitemap",
          org.apache.spark.sql.types.StringType))))
    var frontier = sitemapUrls.select(col(urlCol).cast("string").as("url"))
      .filter(col("url").isNotNull).distinct()
    var seeds = empty
    var depth = 0
    var exhausted = false
    while (!exhausted && depth < maxDepth) {
      val n = frontier.count()
      if (n == 0) exhausted = true
      else {
        require(n <= maxSitemaps,
          s"sitemap frontier at depth $depth holds $n sitemaps > " +
            s"maxSitemaps=$maxSitemaps — refusing (index bomb?); " +
            "raise the cap explicitly if this corpus is real")
        val ledger = harvestResumable(spark, frontier, "url", ledgerDir,
          transport, policy, sleeper)
        val fetched = resolveLatest(ledger)
          .join(frontier, Seq("url"))
          .filter(col("status") === "ok" && col("content").isNotNull)
        // the parse feeds two consumers (entries + child index locs);
        // decode once
        val xml = sitemapXmlText(fetched).localCheckpoint(true)
        val ents = xml.select(col("sitemap"),
            explode(graft.functions.web.sitemap_entries(col("xml")))
              .as("e"))
          .select(
            graft.functions.web.canonical_url(col("e.loc")).as("url"),
            col("e.lastmod").as("lastmod"), col("sitemap"))
          .filter(col("url") =!= "")
        seeds = seeds.unionByName(ents)
        frontier = xml.select(
            explode(graft.functions.web.sitemap_index_locs(col("xml")))
              .as("url"))
          .filter(col("url") =!= "").distinct()
        depth += 1
      }
    }
    seeds.distinct()
  }

  /** Sitemap discovery per host (the full cold-start story): fetch
    * each host's `/robots.txt` through the resumable harvest, extract
    * the group-independent `Sitemap:` directives
    * ([[graft.functions.web.robots_sitemap_locs]] — native column
    * work over the fetched bodies), and run [[sitemapSeeds]] over
    * their union. Hosts are given as base URLs (`http://h.example`);
    * robots and sitemap ledgers land under separate subdirectories of
    * `ledgerDir`, so re-runs are served from both ledgers. */
  def sitemapSeedsFromRobots(
      spark: SparkSession, hosts: DataFrame, hostCol: String,
      ledgerDir: String, transport: FetchTransport,
      policy: FetchPolicy = FetchPolicy(), maxDepth: Int = 3,
      maxSitemaps: Long = 100000L,
      sleeper: Long => Unit = Thread.sleep): DataFrame = {
    val robotsUrls = hosts
      .select(concat(regexp_replace(col(hostCol).cast("string"),
        "/+$", ""), lit("/robots.txt")).as("url"))
      .filter(col("url").isNotNull).distinct()
    val ledger = harvestResumable(spark, robotsUrls, "url",
      s"$ledgerDir/robots", transport, policy, sleeper)
    val smUrls = resolveLatest(ledger).join(robotsUrls, Seq("url"))
      .filter(col("status") === "ok" && col("content").isNotNull)
      .select(explode(graft.functions.web.robots_sitemap_locs(
        decode(col("content"), "UTF-8"))).as("u"))
      .distinct()
    sitemapSeeds(spark, smUrls, "u", s"$ledgerDir/sitemaps", transport,
      policy, maxDepth, maxSitemaps, sleeper)
  }
}
