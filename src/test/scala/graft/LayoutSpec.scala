package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CorpusIO

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("writeSorted produces disjoint tightly-bounded files that range filters prune") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/events"
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    CorpusIO.writeSorted(events, dir, Seq("event_id"), numFiles = 8)

    // file-level min/max stats for the sort key must be disjoint —
    // that disjointness IS what lets a range predicate prune files
    val perFile = spark.read.parquet(dir)
      .select(col("event_id"), input_file_name().as("f"))
      .groupBy("f").agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perFile.length === 8, s"expected 8 files, got ${perFile.length}")
    val ranges = perFile.map(t => (t._2, t._3)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, "file ranges overlap")
      case _ =>
    }

    // a selective range filter is pushed to the scan and row counts
    // match the unsorted source
    val q = spark.read.parquet(dir).filter(col("event_id") < 100)
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters") && planStr.contains("LessThan(event_id,100)"),
      s"range predicate not pushed:\n$planStr")
    assert(q.count() === events.filter(col("event_id") < 100).count())

    // pruning evidence: with disjoint per-file ranges, every file
    // whose min exceeds the cut satisfies the pushed predicate via
    // footer stats alone — all but (at most) one file here
    assert(perFile.count(_._2 >= 100) >= 7,
      "at most one file should overlap event_id < 100")
  }

  test("writeSorted layout survives round-trip content equality") {
    val dir = Files.createTempDirectory("graft-layout2").toString + "/docs"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    CorpusIO.writeSorted(docs, dir, Seq("doc_id"), numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    assert(back.select(sum(col("doc_id"))).head.getLong(0) ===
      docs.select(sum(col("doc_id"))).head.getLong(0))
  }

  test("upsertParquet merges batch-wins-per-key, creates, and is idempotent") {
    val base = Files.createTempDirectory("graft-upsert").toString
    val path = s"$base/tbl"
    val v1 = Seq((1L, "one", "en"), (2L, "two", "en"), (3L, "three", "de"))
      .toDF("id", "text", "lang")
    // creation path: no existing table
    assert(CorpusIO.upsertParquet(spark, path, v1, Seq("id")) === 3L)
    val batch = Seq((2L, "TWO", "en"), (4L, "four", "de"))
      .toDF("id", "text", "lang")
    assert(CorpusIO.upsertParquet(spark, path, batch, Seq("id")) === 4L)
    val got = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "one", 2L -> "TWO", 3L -> "three", 4L -> "four"))
    // idempotent re-apply; no temp dir left behind
    assert(CorpusIO.upsertParquet(spark, path, batch, Seq("id")) === 4L)
    assert(!new java.io.File(path + ".__upsert_tmp").exists())
  }

  test("compact re-lays a fragmented table to the byte-target file count") {
    val base = Files.createTempDirectory("graft-compact").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.repartition(32).write.mode("overwrite").parquet(s"$base/frag")
    def dataFiles(d: String) = new java.io.File(d).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(dataFiles(s"$base/frag").length === 32, "fixture is fragmented")

    val p = new org.apache.hadoop.fs.Path(s"$base/frag")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val total = fs.getContentSummary(p).getLength

    // target = half the input bytes → exactly ceil(total / (total/2)) = 2..3 files
    val n = CorpusIO.compact(spark, s"$base/frag", s"$base/out", targetBytes = total / 2)
    assert(n === dataFiles(s"$base/out").length, "returned count matches layout")
    assert(n >= 2 && n <= 3, s"byte-target arithmetic: got $n files")

    // content preserved exactly
    val back = spark.read.parquet(s"$base/out")
    assert(back.count() === docs.count())
    assert(back.select(sum(col("doc_id"))).head.getLong(0) ===
      docs.select(sum(col("doc_id"))).head.getLong(0))

    // with sortCols, compaction doubles as a clustering pass: disjoint
    // per-file doc_id ranges, like writeSorted
    val n2 = CorpusIO.compact(spark, s"$base/frag", s"$base/sorted",
      targetBytes = total / 4, sortCols = Seq("doc_id"))
    assert(n2 >= 4)
    val ranges = spark.read.parquet(s"$base/sorted")
      .select(col("doc_id"), input_file_name().as("f"))
      .groupBy("f").agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, "file ranges overlap")
      case _ =>
    }
  }

  test("fileManifest: per-file sizes and SHA-256 match the filesystem") {
    val base = Files.createTempDirectory("graft-manifest").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .repartition(col("lang"))
      .write.partitionBy("lang").parquet(s"$base/rel")
    val rows = CorpusIO.fileManifest(spark, s"$base/rel").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = new java.io.File(new java.net.URI(r.getString(0)))
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      assert(r.getLong(1) === bytes.length.toLong, s"size mismatch for $f")
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val expect = md.digest(bytes).map("%02x".format(_)).mkString
      assert(r.getString(2) === expect, s"sha mismatch for $f")
    }
  }

  test("releaseManifest rolls up files/bytes/rows per partition consistently") {
    val base = Files.createTempDirectory("graft-manifest2").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.repartition(col("lang")).write.partitionBy("lang").parquet(s"$base/rel")
    val m = CorpusIO.releaseManifest(spark, s"$base/rel", "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expectRows = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet === expectRows.keySet)
    expectRows.foreach { case (lang, n) =>
      val (files, bytes, rows) = m(lang)
      assert(rows === n, s"$lang row count")
      assert(files >= 1 && bytes > 0)
    }
    // bytes reconcile with the per-file manifest
    val perFile = CorpusIO.fileManifest(spark, s"$base/rel")
      .select(sum("size_bytes")).head().getLong(0)
    assert(m.values.map(_._2).sum === perFile)
  }

  test("releaseManifest survives Hive-escaped partition values") {
    val base = Files.createTempDirectory("graft-manifest3").toString
    // ':' forces Hive path escaping (src=a%3Ab on disk) — the audit
    // must key both halves on the same raw segment, not drop the
    // partition to a raw-vs-decoded join mismatch
    Seq((1L, "a:b"), (2L, "a:b"), (3L, "plain"))
      .toDF("id", "src")
      .repartition(col("src")).write.partitionBy("src").parquet(s"$base/rel")
    val m = CorpusIO.releaseManifest(spark, s"$base/rel", "src")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m.values.sum === 3L, s"no partition may vanish from the audit: $m")
    assert(m === Map("a:b" -> 2L, "plain" -> 1L),
      s"partition values must come back DECODED: $m")
    // the per-file manifest must be able to OPEN files in escaped
    // dirs (a URI re-parse would double-decode %3A and miss the file)
    val files = CorpusIO.fileManifest(spark, s"$base/rel").collect()
    assert(files.length >= 2 && files.forall(_.getString(2).length === 64))
  }

  test("releaseManifest: numeric-looking partition strings keep their spelling") {
    val base = Files.createTempDirectory("graft-manifest5").toString
    // type inference would read "01" back as int 1 and the audit
    // would claim the populated partition holds zero rows
    Seq((1L, "01"), (2L, "01"), (3L, "1.10"))
      .toDF("id", "src")
      .repartition(col("src")).write.partitionBy("src").parquet(s"$base/rel")
    val m = CorpusIO.releaseManifest(spark, s"$base/rel", "src")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m === Map("01" -> 2L, "1.10" -> 1L), s"audit mismatch: $m")
  }

  test("releaseManifest: a NULL partition joins null-safely, never drops") {
    val base = Files.createTempDirectory("graft-manifest4").toString
    Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
        (3L, "known"))
      .toDF("id", "src")
      .repartition(col("src")).write.partitionBy("src").parquet(s"$base/rel")
    val rows = CorpusIO.releaseManifest(spark, s"$base/rel", "src")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(3)).toMap
    assert(rows === Map(None -> 2L, Some("known") -> 1L),
      s"the __HIVE_DEFAULT_PARTITION__ sentinel must audit as NULL: $rows")
  }
}
