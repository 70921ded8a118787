package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}
import graft.sources.Jdbc

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, Array.tabulate(256)(_.toByte), MediaMeta("image", "jpeg", 64, 64, 0L, 0)),
    MediaRow(2L, Array.tabulate(512)(i => (i * 7).toByte), MediaMeta("audio", "wav", 0, 0, 4000L, 16000)),
    MediaRow(3L, Array.tabulate(1024)(i => (i * 13).toByte), MediaMeta("video", "mp4", 320, 240, 5000L, 0))
  ).toDS()

  test("feature extraction: stable dims, deterministic across runs and partitionings") {
    val a = Multimodal.extractFeatures(media, dim = 32).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media.repartition(3), dim = 32).collect().sortBy(_.media_id)
    assert(a.forall(_.features.length === 32))
    assert(a.map(_.features.toSeq).toSeq === b.map(_.features.toSeq).toSeq,
      "decode must be deterministic regardless of partitioning")
    assert(a.map(_.n_bytes).toSeq === Seq(256L, 512L, 1024L))
  }

  test("frame sampling: video yields duration-derived frames, image/audio one each") {
    val frames = Multimodal.sampleFrames(media).collect()
    val byId = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(byId(1L) === 1 && byId(2L) === 1)
    assert(byId(3L) === 5, "5s video at 1 fps stub = 5 frames")
    val every2 = Multimodal.sampleFrames(media, everyNth = 2).collect()
      .count(_.media_id == 3L)
    assert(every2 === 3, "frame stride respected")
  }

  test("metadata summary prunes binary column (plumbing contract)") {
    val df = media.toDF()
    val summary = Multimodal.metadataSummary(df)
    val rows = summary.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === Map("image" -> 1L, "audio" -> 1L, "video" -> 1L))
    val plan = summary.queryExecution.optimizedPlan.toString
    assert(!plan.contains("content#") || !plan.split("\n").exists(l =>
      l.contains("Project") && l.contains("content")),
      "binary payload must not flow through the aggregate")
  }

  test("jdbc: driver registry, url templating, incremental subquery pushdown") {
    assert(Jdbc.urlFor("postgresql", "h", 5432, "db") === "jdbc:postgresql://h:5432/db")
    assert(Jdbc.urlFor("sqlserver", "h", 1433, "db") === "jdbc:sqlserver://h:1433;databaseName=db")
    assert(Jdbc.driverRegistry("mysql") === "com.mysql.cj.jdbc.Driver")
    // the reference's dedicated Teradata connector
    // (src/connectors/teradata_connector.py) maps to the public
    // TeraDriver + DBS_PORT URL form
    assert(Jdbc.urlFor("teradata", "h", 1025, "db") ===
      "jdbc:teradata://h/DATABASE=db,DBS_PORT=1025")
    assert(Jdbc.driverRegistry("teradata") === "com.teradata.jdbc.TeraDriver")
    assert(Jdbc.incrementalSubquery("t", "updated_at", null) === "t")
    assert(Jdbc.incrementalSubquery("t", "updated_at", "2026-01-01 00:00:00") ===
      "(SELECT * FROM t WHERE updated_at > '2026-01-01 00:00:00') AS graft_incr")
    intercept[IllegalArgumentException](Jdbc.urlFor("nope", "h", 1, "db"))
  }
}
