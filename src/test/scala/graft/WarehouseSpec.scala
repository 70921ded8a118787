package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.Warehouse

class WarehouseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("run lifecycle + views: latest metrics, trends, performance, lineage") {
    val dir = Files.createTempDirectory("graft-wh").toString

    val t1 = new Warehouse.MetricsTracker(spark, dir, "unify")
    t1.metric("record_count", 100.0, "count", "train")
    t1.lineage("a.jsonl", "jsonl", "silver", 120, 100)
    t1.complete(input = 120, output = 100)

    val t2 = new Warehouse.MetricsTracker(spark, dir, "unify")
    t2.metric("record_count", 140.0, "count", "train")
    t2.lineage("b.jsonl", "jsonl", "silver", 150, 140)
    t2.complete(input = 150, output = 140)

    val t3 = new Warehouse.MetricsTracker(spark, dir, "unify")
    t3.fail("boom")

    Warehouse.register(spark, dir)

    val latest = spark.sql("SELECT metric_value FROM latest_quality_metrics").collect()
    assert(latest.length === 1 && latest(0).getDouble(0) === 140.0,
      "latest successful run's metric wins")

    val perf = spark.sql(
      """SELECT total_runs, successful_runs, failed_runs
        |FROM pipeline_performance WHERE pipeline_name = 'unify'""".stripMargin).head()
    assert(perf.getLong(0) === 3 && perf.getLong(1) === 2 && perf.getLong(2) === 1)

    val lineage = spark.sql(
      "SELECT records_ingested, validity_pct FROM data_lineage_summary").head()
    assert(lineage.getLong(0) === 270)
    assert(math.abs(lineage.getDouble(1) - 88.89) < 0.01)

    val trends = spark.sql("SELECT n_measurements FROM quality_trends").collect()
    assert(trends.map(_.getLong(0)).sum === 2, "failed run's metrics excluded")

    val report = Warehouse.qualityTrendReport(spark)
    assert(report.columns.toSeq ===
      Seq("run_date", "metric_name", "dataset_split", "avg_value", "ma7", "trend"))
    assert(report.count() >= 1)
  }

  test("quality_anomalies view z-scores trend breaks against the trailing window") {
    val dir = Files.createTempDirectory("graft-wh-anom").toString
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2026-03-$day%02d 02:00:00")
    // 7 steady days at 100±1, then a collapse to 40 on day 8
    val runs = (1 to 8).map(d =>
      (s"r$d", "unify", ts(d), ts(d), "success", 10L, 10L, 0L, 60.0,
        null.asInstanceOf[String], "abc", "{}"))
      .toDF(Warehouse.pipelineRunsSchema.fieldNames.toSeq: _*)
    val vals = Seq(100.0, 102.0, 98.0, 100.0, 102.0, 98.0, 100.0, 40.0)
    val metrics = vals.zipWithIndex.map { case (v, i) =>
      (s"r${i + 1}", "record_count", v, "count", "train", ts(i + 1))
    }.toDF(Warehouse.qualityMetricsSchema.fieldNames.toSeq: _*)
    runs.write.parquet(s"$dir/pipeline_runs")
    metrics.write.parquet(s"$dir/quality_metrics")
    Warehouse.register(spark, dir)
    val anomalies = spark.sql(
      """SELECT run_date, avg_value, z_score FROM quality_anomalies
        |WHERE abs(z_score) >= 2 ORDER BY run_date""".stripMargin).collect()
    assert(anomalies.length === 1, s"exactly the collapse flagged: ${anomalies.toSeq}")
    assert(anomalies.head.getDouble(1) === 40.0)
    assert(anomalies.head.getDouble(2) < -2, "collapse is a strongly negative z")
  }

  test("tracker batches: one parquet append per table per run lifecycle") {
    val dir = Files.createTempDirectory("graft-wh-batch").toString
    val t = new Warehouse.MetricsTracker(spark, dir, "unify")
    t.metric("m1", 1.0); t.metric("m2", 2.0); t.metric("m3", 3.0)
    t.lineage("a.jsonl", "jsonl", "silver", 10, 9)
    t.lineage("b.jsonl", "jsonl", "silver", 20, 20)
    def partFiles(name: String): Int = {
      val d = new java.io.File(s"$dir/$name")
      if (!d.exists()) 0
      else d.listFiles().count(f => f.getName.startsWith("part-"))
    }
    assert(partFiles("quality_metrics") === 0, "nothing written before complete()")
    t.complete(input = 30, output = 29)
    assert(partFiles("quality_metrics") === 1, "3 metrics in ONE append")
    assert(partFiles("data_lineage") === 1, "2 lineage rows in ONE append")
    assert(spark.read.parquet(s"$dir/quality_metrics").count() === 3)
    assert(spark.read.parquet(s"$dir/data_lineage").count() === 2)
  }
}
