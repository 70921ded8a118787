package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc

/** S8/S9 against a REAL database: embedded Derby (ships with Spark's
  * distribution for the Hive metastore), standing in for the server
  * databases in the registry. The reference drives its connectors
  * against live cursors with batched fetch + retry
  * (/root/reference/src/connectors/oracle_connector.py:95-241,
  * generic_jdbc_connector.py:186-229); these tests create, load, and
  * incrementally re-read real tables, and prove the exponential
  * backoff actually fires — string-level subquery tests live in
  * MultimodalSpec. */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Derby's engine writes derby.log to derby.system.home — keep it out
  // of the repo. Must be set before the first connection boots.
  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("graft_derby_home").toString)

  private def freshDb(prefix: String): Jdbc.Conn = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    val db = s"$dir/db"
    // boots the engine and creates the database
    DriverManager.getConnection(s"jdbc:derby:$db;create=true").close()
    Jdbc.Conn("derby", "unused", 0, db, "app", "app")
  }

  private def exec(conn: Jdbc.Conn, sql: String): Unit = {
    val c = DriverManager.getConnection(conn.url)
    try { val st = c.createStatement(); try st.execute(sql) finally st.close() }
    finally c.close()
  }

  test("S8: incrementalScan pushes a real watermark predicate and shards the read") {
    val conn = freshDb("graft_jdbc_scan")
    // ISO-8601 VARCHAR watermark: lexicographic order == time order,
    // so the pushed `wm > 'lastSync'` comparison is DB-portable.
    exec(conn, "CREATE TABLE events_src (id INT NOT NULL, wm VARCHAR(19) NOT NULL, payload VARCHAR(100))")
    (1 to 10).foreach { i =>
      exec(conn, f"INSERT INTO events_src VALUES ($i, '2026-01-$i%02dT00:00:00', 'p$i')")
    }

    // full scan when no watermark
    val full = Jdbc.incrementalScan(spark, conn, "events_src", "wm", lastSync = null)
    assert(full.count() === 10L)

    // watermark scan: only rows strictly past lastSync, filtered by the
    // DATABASE (the predicate is inside the dbtable subquery), sharded
    // into numPartitions real partitions by the partition column
    val got = Jdbc.incrementalScan(spark, conn, "events_src", "wm",
      lastSync = "2026-01-05T00:00:00",
      partitionCol = Some("id"), lowerBound = 0L, upperBound = 16L, numPartitions = 4)
    assert(got.rdd.getNumPartitions === 4, "partitioned read must shard the scan")
    val ids = got.select("id").collect().map(_.getInt(0)).toSet
    assert(ids === (6 to 10).toSet, s"watermark must cut at lastSync exclusive: $ids")
  }

  test("S9 + S8 round-trip: bulkWrite appends; the watermark re-read sees only new rows") {
    val conn = freshDb("graft_jdbc_sink")
    exec(conn, "CREATE TABLE docs_sink (doc_id BIGINT, wm VARCHAR(19), body VARCHAR(200))")

    val batch1 = Seq((1L, "2026-02-01T00:00:00", "uno"), (2L, "2026-02-02T00:00:00", "ome"))
      .toDF("doc_id", "wm", "body")
    Jdbc.bulkWrite(batch1, conn, "docs_sink", batchSize = 2, maxRetries = 1, baseBackoffMs = 50L)

    val afterFirst = Jdbc.incrementalScan(spark, conn, "docs_sink", "wm", lastSync = null)
    assert(afterFirst.count() === 2L)

    val batch2 = Seq((3L, "2026-02-03T00:00:00", "eyi")).toDF("doc_id", "wm", "body")
    Jdbc.bulkWrite(batch2, conn, "docs_sink", batchSize = 2, maxRetries = 1, baseBackoffMs = 50L)

    // CDC semantics: a reader that saw batch1 re-reads past its high
    // watermark and receives exactly batch2
    val incr = Jdbc.incrementalScan(spark, conn, "docs_sink", "wm",
      lastSync = "2026-02-02T00:00:00")
    val rows = incr.collect()
    assert(rows.length === 1 && rows.head.getLong(0) === 3L,
      s"watermark re-read must return only the new row: ${rows.mkString(",")}")
  }

  test("S9: exponential backoff retries a transient fault, then the real write lands") {
    val conn = freshDb("graft_jdbc_retry")
    exec(conn, "CREATE TABLE retry_sink (doc_id BIGINT, body VARCHAR(200))")
    val df = Seq((7L, "nahui")).toDF("doc_id", "body")

    var attempts = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val t0 = System.nanoTime()
    Jdbc.retryWithBackoff(maxRetries = 3, baseBackoffMs = 120L) { () =>
      attempts += 1
      sleeps += (System.nanoTime() - t0) / 1000000L
      if (attempts <= 2)
        throw new java.sql.SQLTransientConnectionException("injected network blip")
      // the surviving attempt performs the REAL database write
      df.write.format("jdbc")
        .option("url", conn.url).option("driver", conn.driver)
        .option("user", conn.user).option("password", conn.password)
        .option("dbtable", "retry_sink").mode("append").save()
    }
    assert(attempts === 3, "two transient failures must consume two retries")
    // attempt 2 starts >= 120 ms after attempt 1, attempt 3 >= 120+240
    assert(sleeps(1) - sleeps(0) >= 120L, s"first backoff too short: $sleeps")
    assert(sleeps(2) - sleeps(1) >= 240L, s"backoff must double: $sleeps")
    val landed = Jdbc.incrementalScan(spark, conn, "retry_sink", "body", lastSync = null)
      .collect()
    assert(landed.length === 1 && landed.head.getAs[Long]("DOC_ID") === 7L)
  }

  test("S9: a permanent database failure exhausts retries with backoff, then rethrows") {
    val conn = freshDb("graft_jdbc_fail")
    // VARCHAR(2) rejects the 4-char body on EVERY attempt — a real,
    // non-transient database error (Derby 22001 truncation)
    exec(conn, "CREATE TABLE tiny_sink (doc_id BIGINT, body VARCHAR(2))")
    val df = Seq((1L, "toolong")).toDF("doc_id", "body")
    val t0 = System.nanoTime()
    val e = intercept[Exception] {
      Jdbc.bulkWrite(df, conn, "tiny_sink", batchSize = 10,
        maxRetries = 2, baseBackoffMs = 100L)
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(elapsedMs >= 300L, // 100 + 200 ms of backoff before the final attempt
      s"both backoff sleeps must elapse before rethrow: ${elapsedMs}ms")
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.getMessage != null && c.getMessage.contains("truncation")),
      s"must surface the database error: $e")
  }
}
