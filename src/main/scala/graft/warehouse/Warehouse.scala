package graft.warehouse

import java.sql.Timestamp
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata warehouse (SURVEY §2.9): run/metric/lineage tables as
  * Parquet-backed Spark SQL tables, with the reference's SQLite views
  * re-expressed verbatim-ish in Spark SQL
  * (/root/reference/sql/schema.sql:171-231,
  * sql/queries/quality_trends.sql:1-61).
  *
  * The SQLite trigger computing run duration becomes a computed column
  * at write time; `julianday` arithmetic becomes `unix_timestamp`
  * diffs. All views run through Catalyst (CTEs, window frames, LAG,
  * NULLIF are native Spark SQL).
  */
object Warehouse {

  val pipelineRunsSchema: StructType = StructType(Seq(
    StructField("run_id", StringType, nullable = false),
    StructField("pipeline_name", StringType),
    StructField("started_at", TimestampType),
    StructField("ended_at", TimestampType),
    StructField("status", StringType),
    StructField("records_input", LongType),
    StructField("records_output", LongType),
    StructField("records_filtered", LongType),
    StructField("duration_seconds", DoubleType),
    StructField("error_message", StringType),
    StructField("git_commit_hash", StringType),
    StructField("config_snapshot", StringType)))

  val qualityMetricsSchema: StructType = StructType(Seq(
    StructField("run_id", StringType, nullable = false),
    StructField("metric_name", StringType),
    StructField("metric_value", DoubleType),
    StructField("metric_unit", StringType),
    StructField("dataset_split", StringType),
    StructField("measured_at", TimestampType)))

  val dataLineageSchema: StructType = StructType(Seq(
    StructField("run_id", StringType, nullable = false),
    StructField("source_file", StringType),
    StructField("source_type", StringType),
    StructField("source_layer", StringType),
    StructField("records_ingested", LongType),
    StructField("records_valid", LongType),
    StructField("records_invalid", LongType),
    StructField("ingested_at", TimestampType),
    StructField("checksum", StringType)))

  def tablePath(dir: String, name: String): String = s"$dir/$name"

  /** Register the three core tables (creating empty ones if absent)
    * and the four analytic views. */
  def register(spark: SparkSession, dir: String): Unit = {
    def load(name: String, schema: StructType): DataFrame =
      try spark.read.schema(schema).parquet(tablePath(dir, name))
      catch { case _: Exception => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema) }
    load("pipeline_runs", pipelineRunsSchema).createOrReplaceTempView("pipeline_runs")
    load("quality_metrics", qualityMetricsSchema).createOrReplaceTempView("quality_metrics")
    load("data_lineage", dataLineageSchema).createOrReplaceTempView("data_lineage")

    // sql/schema.sql:171-187 — latest successful run's metrics (J6).
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW latest_quality_metrics AS
        |SELECT qm.metric_name, qm.metric_value, qm.metric_unit,
        |       qm.dataset_split, pr.pipeline_name, pr.started_at
        |FROM quality_metrics qm
        |JOIN pipeline_runs pr ON qm.run_id = pr.run_id
        |WHERE pr.started_at = (SELECT MAX(started_at) FROM pipeline_runs
        |                       WHERE status = 'success')""".stripMargin)

    // sql/schema.sql:189-201 — A9 grouped trend aggregate.
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW quality_trends AS
        |SELECT DATE(pr.started_at) AS run_date, qm.metric_name, qm.dataset_split,
        |       AVG(qm.metric_value) AS avg_value, MIN(qm.metric_value) AS min_value,
        |       MAX(qm.metric_value) AS max_value, STDDEV(qm.metric_value) AS stddev_value,
        |       COUNT(*) AS n_measurements
        |FROM quality_metrics qm
        |JOIN pipeline_runs pr ON qm.run_id = pr.run_id
        |WHERE pr.status = 'success'
        |GROUP BY DATE(pr.started_at), qm.metric_name, qm.dataset_split""".stripMargin)

    // sql/schema.sql:203-214 — A10 conditional pivot per pipeline/day.
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW pipeline_performance AS
        |SELECT pipeline_name, DATE(started_at) AS run_date,
        |       COUNT(*) AS total_runs,
        |       SUM(CASE WHEN status = 'success' THEN 1 ELSE 0 END) AS successful_runs,
        |       SUM(CASE WHEN status = 'failed' THEN 1 ELSE 0 END) AS failed_runs,
        |       AVG(duration_seconds) AS avg_duration_seconds,
        |       SUM(records_output) AS total_records_produced
        |FROM pipeline_runs
        |GROUP BY pipeline_name, DATE(started_at)""".stripMargin)

    // sql/schema.sql:216-231 — A11 guarded validity ratio.
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW data_lineage_summary AS
        |SELECT dl.source_layer, dl.source_type,
        |       COUNT(DISTINCT dl.source_file) AS n_sources,
        |       SUM(dl.records_ingested) AS records_ingested,
        |       SUM(dl.records_valid) AS records_valid,
        |       CAST(ROUND(100.0 * SUM(dl.records_valid) /
        |             NULLIF(SUM(dl.records_ingested), 0), 2) AS DOUBLE) AS validity_pct
        |FROM data_lineage dl
        |GROUP BY dl.source_layer, dl.source_type""".stripMargin)

    // [E] anomaly surface over the trend view: each day's avg_value
    // z-scored against the metric's trailing 7-day window (explicit
    // integer-free sums — same engine-stable formulation as q63).
    // A |z| ≥ 2 row is a quality regression candidate worth gating on.
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW quality_anomalies AS
        |WITH w AS (
        |  SELECT run_date, metric_name, dataset_split, avg_value,
        |         COUNT(avg_value) OVER win AS c,
        |         SUM(avg_value) OVER win AS s1,
        |         SUM(avg_value * avg_value) OVER win AS s2
        |  FROM quality_trends
        |  WINDOW win AS (PARTITION BY metric_name, dataset_split
        |                 ORDER BY run_date
        |                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT run_date, metric_name, dataset_split, avg_value,
        |         s1 / c AS mean, (s2 - s1 * s1 / c) / (c - 1) AS var
        |  FROM w WHERE c >= 3)
        |SELECT run_date, metric_name, dataset_split, avg_value,
        |       ROUND((avg_value - mean) / SQRT(var), 4) AS z_score
        |FROM z
        |WHERE var > 0""".stripMargin)
  }

  /** The standalone CTE + window report
    * (sql/queries/quality_trends.sql:1-61): daily aggregate → 7-day
    * moving average (W1) → LAG trend classification (W2) → sort. */
  def qualityTrendReport(spark: SparkSession, days: Int = 30): DataFrame =
    spark.sql(
      s"""WITH recent AS (
         |  SELECT DATE(pr.started_at) AS run_date, qm.metric_name,
         |         qm.dataset_split, qm.metric_value
         |  FROM quality_metrics qm
         |  JOIN pipeline_runs pr ON qm.run_id = pr.run_id
         |  WHERE pr.status = 'success'
         |    AND pr.started_at >= DATE_SUB(CURRENT_DATE(), $days)),
         |daily AS (
         |  SELECT run_date, metric_name, dataset_split,
         |         AVG(metric_value) AS avg_value
         |  FROM recent GROUP BY run_date, metric_name, dataset_split)
         |SELECT run_date, metric_name, dataset_split, avg_value,
         |  AVG(avg_value) OVER (PARTITION BY metric_name, dataset_split
         |    ORDER BY run_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7,
         |  CASE
         |    WHEN LAG(avg_value, 7) OVER w IS NULL THEN '→'
         |    WHEN avg_value > LAG(avg_value, 7) OVER w * 1.02 THEN '↑'
         |    WHEN avg_value < LAG(avg_value, 7) OVER w * 0.98 THEN '↓'
         |    ELSE '→' END AS trend
         |FROM daily
         |WINDOW w AS (PARTITION BY metric_name, dataset_split ORDER BY run_date)
         |ORDER BY run_date DESC, metric_name""".stripMargin)

  private def append(spark: SparkSession, dir: String, name: String,
      schema: StructType, rows: Seq[org.apache.spark.sql.Row]): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode(SaveMode.Append).parquet(tablePath(dir, name))

  /** MetricsTracker analog (src/utils/metrics.py:77-189): run lifecycle
    * + metric/lineage sinks. Duration is the computed column replacing
    * the SQLite trigger.
    *
    * `metric`/`lineage` BUFFER in driver memory; everything lands in
    * ONE parquet append per table when the run finishes (`complete` or
    * `fail`). The reference's row-at-a-time SQLite inserts translated
    * literally would make every metric call a one-row parquet file — a
    * small-files generator at any real run cadence. */
  final class MetricsTracker(spark: SparkSession, dir: String, pipelineName: String) {
    import org.apache.spark.sql.Row
    val runId: String = UUID.randomUUID().toString
    private val startedAt = new Timestamp(System.currentTimeMillis())
    private val metricRows = scala.collection.mutable.ArrayBuffer.empty[Row]
    private val lineageRows = scala.collection.mutable.ArrayBuffer.empty[Row]

    private def flush(runRow: Row): Unit = {
      append(spark, dir, "pipeline_runs", pipelineRunsSchema, Seq(runRow))
      if (metricRows.nonEmpty)
        append(spark, dir, "quality_metrics", qualityMetricsSchema, metricRows.toSeq)
      if (lineageRows.nonEmpty)
        append(spark, dir, "data_lineage", dataLineageSchema, lineageRows.toSeq)
      metricRows.clear()
      lineageRows.clear()
    }

    def complete(input: Long, output: Long, configJson: String = "{}"): Unit = {
      val ended = new Timestamp(System.currentTimeMillis())
      val dur = (ended.getTime - startedAt.getTime) / 1000.0
      flush(Row(runId, pipelineName, startedAt, ended, "success",
        input, output, input - output, dur, null, null, configJson))
    }

    def fail(error: String): Unit = {
      val ended = new Timestamp(System.currentTimeMillis())
      val dur = (ended.getTime - startedAt.getTime) / 1000.0
      flush(Row(runId, pipelineName, startedAt, ended, "failed",
        null, null, null, dur, error, null, null))
    }

    def metric(name: String, value: Double, unit: String = "count",
        split: String = "all"): Unit =
      metricRows += Row(
        runId, name, value, unit, split, new Timestamp(System.currentTimeMillis()))

    def lineage(sourceFile: String, sourceType: String, layer: String,
        ingested: Long, valid: Long): Unit =
      lineageRows += Row(
        runId, sourceFile, sourceType, layer, ingested, valid,
        ingested - valid, new Timestamp(System.currentTimeMillis()), null)
  }
}
