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
}
