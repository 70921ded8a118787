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
