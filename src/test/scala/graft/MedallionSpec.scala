package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.Warehouse

/** Bronze→Silver→Diamond→Gold staged progression
  * (airflow_dags/corc_nah_etl_dag.py:246-263 shape): stage counts,
  * per-stage lineage rows, split partitioning, GE gate. */
class MedallionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val esA = "los antiguos mexicanos cantaban sus poemas cada mañana en el mercado grande"
  private val esB = "los antiguos mexicanos cantaban sus poemas cada tarde en el mercado grande"

  private def fixture(): String = {
    val dir = Files.createTempDirectory("graft-medallion")
    val f = dir.resolve("in.jsonl")
    Files.writeString(f, Seq(
      s"""{"es": "$esA", "nah": "Cualli tōnalli nimitztlazohtla"}""",
      s"""{"es": "$esA", "nah": "Cualli tōnalli nimitztlazohtla"}""", // exact dup
      s"""{"es": "$esB", "nah": "Cualli tōnalli nimitztlazohtla"}""", // near dup (one word)
      """{"es": "muchas gracias por toda la ayuda de ayer", "nah": "Tlazohcāmati huel miac"}""",
      """{"es": "solo español sin indígena"}"""                       // invalid
    ).mkString("\n"))
    f.toString
  }

  test("staged medallion run: counts, lineage per stage, gold split partitions, gate") {
    val base = Files.createTempDirectory("graft-medallion-out").toString
    val whDir = Files.createTempDirectory("graft-medallion-wh").toString
    val tracker = new Warehouse.MetricsTracker(spark, whDir, "medallion")

    val (stages, results) = MedallionPipeline.run(
      spark, Seq(fixture()), base, tracker = Some(tracker))
    tracker.complete(stages.head.out, stages.last.out)

    assert(stages.map(_.stage) === Seq("bronze", "silver", "diamond", "gold"))
    val byStage = stages.map(s => s.stage -> s).toMap
    assert(byStage("bronze").out === 5, "raw rows land in bronze untouched")
    assert(byStage("silver").out === 4, "invalid row dropped at silver")
    assert(byStage("diamond").out === 2, "exact dup + near dup removed at diamond")
    assert(byStage("gold").out === 2)
    assert(stages.forall(s => s.stage == "bronze" || s.in >= s.out),
      "stages are monotone non-increasing")

    // stage outputs are real restartable parquet layers
    assert(spark.read.parquet(byStage("silver").path)
      .select("layer").distinct().head().getString(0) === "silver")
    val goldDirs = new java.io.File(byStage("gold").path)
      .listFiles().filter(_.isDirectory).map(_.getName)
    assert(goldDirs.forall(_.startsWith("split=")), "gold partitioned by split")

    // gate passes on the clean fixture
    assert(results.nonEmpty && operators.Quality.gate(results) === 0,
      results.filterNot(_.passed).map(r => s"${r.name}=${r.observed}").mkString(","))

    // one lineage row per stage in the warehouse
    Warehouse.register(spark, whDir)
    val lineage = spark.sql(
      """SELECT source_layer, records_ingested, records_valid FROM data_lineage
        |ORDER BY ingested_at""".stripMargin).collect()
    assert(lineage.map(_.getString(0)).toSet === Set("bronze", "silver", "diamond", "gold"))
    val diamondRow = lineage.find(_.getString(0) == "diamond").get
    assert(diamondRow.getLong(1) === 4 && diamondRow.getLong(2) === 2)
  }

  test("medallion stages are individually restartable (silver rerun from bronze)") {
    val base = Files.createTempDirectory("graft-medallion-rerun").toString
    val b = MedallionPipeline.bronze(spark, Seq(fixture()), s"$base/bronze")
    val s1 = MedallionPipeline.silver(spark, b.path, s"$base/silver")
    val s2 = MedallionPipeline.silver(spark, b.path, s"$base/silver2")
    assert(s1.out === s2.out, "stage rerun from the same input is deterministic")
    assert(spark.read.parquet(s"$base/silver").count() === s1.out)
  }

  // ---- Orchestration: the reference DAG's retry/SLA default_args
  // (corc_nah_etl_dag.py:26-37) applied per stage.

  test("runStage retries transient failures with capped exponential backoff") {
    val policy = Orchestration.RetryPolicy(
      retries = 3, retryDelayMs = 100, exponentialBackoff = true,
      maxRetryDelayMs = 250, slaMs = Long.MaxValue)
    assert(Orchestration.backoffDelays(policy) === Seq(100L, 200L, 250L),
      "base·2^i capped at max_retry_delay")

    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val run = Orchestration.runStage("flaky", policy, slept += _) {
      calls += 1
      if (calls < 3) sys.error(s"transient #$calls")
      "ok"
    }
    assert(run.result === "ok")
    assert(run.attempts === 3 && calls === 3)
    assert(slept.toSeq === Seq(100L, 200L), "backoff actually fired between attempts")
    assert(run.failures.size === 2 && run.failures.forall(_.contains("transient")))
    assert(!run.slaMissed)
  }

  test("runStage exhausts retries and surfaces the last cause; SLA breach is flagged") {
    val policy = Orchestration.RetryPolicy(
      retries = 2, retryDelayMs = 1, maxRetryDelayMs = 1, slaMs = Long.MaxValue)
    val e = intercept[Orchestration.StageFailedException] {
      Orchestration.runStage("doomed", policy, _ => ()) {
        sys.error("persistent")
      }
    }
    assert(e.stage === "doomed" && e.attempts === 3)
    assert(e.getCause.getMessage === "persistent")

    // wall clock (attempt time included) past the stage SLA flips the flag
    val tight = Orchestration.RetryPolicy(retries = 0, slaMs = 0)
    val run = Orchestration.runStage("slow", tight, _ => ()) {
      Thread.sleep(5); 1
    }
    assert(run.slaMissed)
  }

  test("runRetrying recovers a transiently-failing pipeline and records attempts") {
    val base = Files.createTempDirectory("graft-medallion-retry").toString
    val whDir = Files.createTempDirectory("graft-medallion-retry-wh").toString
    val tracker = new Warehouse.MetricsTracker(spark, whDir, "medallion-retry")

    // a glob that fails on first read then heals — the transient
    // object-store shape the reference's connectors retry around
    val realGlob = fixture()
    val flakyDir = Files.createTempDirectory("graft-medallion-flaky")
    val flakyGlob = flakyDir.resolve("in.jsonl").toString
    // bronze attempt 1: glob matches nothing → stage throws;
    // the injected sleeper heals the input before attempt 2
    val heal: Long => Unit = { _ =>
      Files.copy(java.nio.file.Paths.get(realGlob),
        java.nio.file.Paths.get(flakyGlob),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    val policy = Orchestration.RetryPolicy(
      retries = 2, retryDelayMs = 1, maxRetryDelayMs = 1, slaMs = Long.MaxValue)
    val (stages, results) = MedallionPipeline.runRetrying(
      spark, Seq(flakyGlob), base, policy, tracker = Some(tracker), sleep = heal)
    tracker.complete(stages.head.result.out, stages.last.result.out)

    val byStage = stages.map(s => s.stage -> s).toMap
    assert(byStage("bronze").attempts === 2, "bronze failed once then recovered")
    assert(byStage("bronze").failures.size === 1)
    assert(stages.filterNot(_.stage == "bronze").forall(_.attempts === 1))
    assert(byStage("gold").result.out === 2)
    assert(results.nonEmpty && operators.Quality.gate(results) === 0)

    // attempts / SLA metrics land in the warehouse next to lineage
    Warehouse.register(spark, whDir)
    val metrics = spark.sql(
      """SELECT metric_name, metric_value FROM quality_metrics""").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(metrics("bronze_attempts") === 2.0)
    assert(metrics("gold_attempts") === 1.0)
    // the quality stage retries like every other stage — its
    // telemetry must land too
    assert(metrics("quality_attempts") === 1.0)
    assert(metrics.contains("quality_wall_ms") &&
      metrics("quality_sla_missed") === 0.0)
    assert(metrics("pipeline_sla_missed") === 0.0)
    assert(metrics.contains("pipeline_wall_ms"))
  }
}
