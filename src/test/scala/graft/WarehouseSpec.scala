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
}
