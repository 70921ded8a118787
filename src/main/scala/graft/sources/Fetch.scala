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
  }

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

    override def fetch(url: String): Array[Byte] = {
      // URI.create AND newBuilder both throw IllegalArgumentException
      // on malformed / scheme-less input — terminal either way
      val req =
        try java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
          .header("User-Agent", userAgent)
          .GET().build()
        catch { case e: IllegalArgumentException =>
          throw new TerminalFetchException(s"malformed URL: ${e.getMessage}") }
      // send throws HttpTimeoutException / IOException on transport
      // failure — transient by the trait's contract
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      resp.statusCode() match {
        case ok if ok / 100 == 2 => resp.body()
        case 408 | 429 =>
          throw new java.io.IOException(s"HTTP ${resp.statusCode()} (transient)")
        case terminal if terminal / 100 == 4 =>
          throw new TerminalFetchException(s"HTTP $terminal")
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
    * @param jitterSeed    seed for the deterministic jitter hash */
  final case class FetchPolicy(
      maxAttempts: Int = 3,
      baseBackoffMs: Long = 250L,
      maxBackoffMs: Long = 10_000L,
      minGapMs: Long = 0L,
      jitterSeed: Long = 42L) {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    require(baseBackoffMs >= 0 && maxBackoffMs >= baseBackoffMs, "bad backoff bounds")
  }

  /** Ledger row. `status` is `ok` or `failed`; `content` is null on
    * failure, `error` null on success. */
  final case class FetchRecord(
      url: String, host: String, status: String, attempts: Int,
      n_bytes: Long, content_sha256: String, error: String,
      content: Array[Byte])

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
  def harvest(
      urls: DataFrame, urlCol: String, transport: FetchTransport,
      policy: FetchPolicy = FetchPolicy(),
      sleeper: Long => Unit = Thread.sleep): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val distinctUrls = urls.select(col(urlCol).cast("string").as("url"))
      .filter(col("url").isNotNull).distinct()
      // all URLs of a host into ONE task ⇒ per-host serial politeness;
      // hosts spread across the cluster
      .repartition(hostColumn(col("url")))
      .as[String]
    distinctUrls.mapPartitions { it =>
      var lastHost: String = null
      var lastAt = 0L
      it.map { url =>
        val host = hostOf(url)
        if (policy.minGapMs > 0 && host == lastHost) {
          val wait = lastAt + policy.minGapMs - System.nanoTime() / 1000000L
          if (wait > 0) sleeper(wait)
        }
        var attempt = 0
        var result: FetchRecord = null
        while (result == null) {
          attempt += 1
          try {
            val bytes = transport.fetch(url)
            result = FetchRecord(url, host, "ok", attempt,
              bytes.length.toLong, sha256Hex(bytes), null, bytes)
          } catch {
            // terminal before the retry guard: a 404 on attempt 1 of 5
            // records immediately — no backoff, no further requests
            case e: TerminalFetchException =>
              result = FetchRecord(url, host, "failed", attempt, 0L, null,
                s"${e.getClass.getSimpleName}: ${e.getMessage}", null)
            case _: Exception if attempt < policy.maxAttempts =>
              sleeper(backoffMs(policy, url, attempt))
            case e: Exception =>
              result = FetchRecord(url, host, "failed", attempt, 0L, null,
                s"${e.getClass.getSimpleName}: ${e.getMessage}", null)
          }
        }
        lastHost = host
        lastAt = System.nanoTime() / 1000000L
        result
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
    val prior = if (hasPrior) Some(spark.read.parquet(ledgerDir)) else None
    val todo = prior match {
      case Some(l) => pending(urls, l, urlCol)
      case None => urls.select(col(urlCol).cast("string").as("url"))
        .filter(col("url").isNotNull).distinct()
    }
    harvest(todo, "url", transport, policy, sleeper)
      .write.mode("append").parquet(ledgerDir)
    spark.read.parquet(ledgerDir)
  }
}
