package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.text
import graft.operators.{Dedup, Split}
import graft.sources.CorpusIO

/** The reference's main ETL "query" (`python -m src.pipeline.cli run`,
  * SURVEY §3.1) as ONE lazy Catalyst dataflow:
  *
  *   read silver+diamond (S3/S7, legacy coalescing P1)
  *   → validity filter P2 → per-language normalize (F1-F9)
  *   → dedup keep=best with layer priority (D1/D3)
  *   → deterministic seeded split (O4) → gold sinks (S5/S2).
  *
  * The reference executes this eagerly record-at-a-time in Python
  * (src/pipeline/unify.py:80-121); here the whole pipeline is a single
  * logical plan — Catalyst pushes the validity filter into the scan,
  * prunes unused legacy columns, and the only shuffle is the one
  * dedup aggregation. Stats are computed on the result in one extra
  * pass, not one pass per metric.
  */
object UnifyPipeline {

  /** Layer priority: diamond beats silver beats bronze (enums.py:47-60). */
  def layerRank(layer: Column): Column =
    when(layer === "gold", 3).when(layer === "diamond", 2)
      .when(layer === "silver", 1).otherwise(0)

  /** Per-language normalization of the three text columns; text that
    * normalizes to empty becomes null (the reference strips whitespace
    * and converts empty→None, schemas.py:144-159). */
  def normalize(df: DataFrame): DataFrame = {
    def norm(c: String, lang: String) = nullif(text.normalize_text(col(c), lang), lit(""))
    df.withColumn("es", norm("es", "es"))
      .withColumn("nah", norm("nah", "nah"))
      .withColumn("myn", norm("myn", "myn"))
  }

  /** D3 best-record selection: layer priority, then completeness
    * (#non-null languages), then total text length, then es as a
    * deterministic tie-break. */
  def dedupBest(df: DataFrame): DataFrame = {
    val completeness = col("es").isNotNull.cast("int") +
      col("nah").isNotNull.cast("int") + col("myn").isNotNull.cast("int")
    val totalLen = coalesce(length(col("es")), lit(0)) +
      coalesce(length(col("nah")), lit(0)) + coalesce(length(col("myn")), lit(0))
    Dedup.keepBest(df,
      text.dedup_key(col("es"), col("nah"), col("myn")),
      Seq(layerRank(col("layer")), completeness, totalLen))
  }

  /** Per-source ingestion accounting (line/parse counts from the
    * diagnostic pass — feeds `data_lineage`). */
  final case class SourceIngest(
      file: String, layer: String, lines: Long, parsed: Long, malformed: Long)

  final case class UnifyStats(
      input: Long, valid: Long, deduped: Long,
      train: Long, validation: Long, test: Long,
      nahRecords: Long, mynRecords: Long,
      malformed: Long = 0L, sources: Seq[SourceIngest] = Nil)

  /** Union → raw validity pre-filter → normalize → validity. The raw
    * pre-filter is a strict superset of the post-normalize filter
    * (normalization never turns null text non-null), expressed on
    * source columns so Catalyst pushes IsNotNull into the scan —
    * invalid rows never reach the normalization expressions. */
  def validRecords(layers: Seq[DataFrame]): DataFrame = {
    require(layers.nonEmpty, "no input layers")
    val unioned = layers.reduce(_.unionByName(_, allowMissingColumns = true))
    val prefiltered = CorpusIO.validityFilter(unioned)
    CorpusIO.validityFilter(normalize(prefiltered))
  }

  /** O4 seeded split assignment on the dedup key. */
  def withSplit(df: DataFrame, seed: Long,
      ratios: Seq[(String, Double)] = Split.defaultRatios): DataFrame =
    df.withColumn("split",
      Split.assign(text.dedup_key(col("es"), col("nah"), col("myn")), seed, ratios))

  /** Run the full pipeline over already-loaded layer frames. */
  def unify(layers: Seq[DataFrame], seed: Long = 42L,
      ratios: Seq[(String, Double)] = Split.defaultRatios): DataFrame =
    withSplit(dedupBest(validRecords(layers)), seed, ratios)

  /** End-to-end: read layer directories, unify, write gold, return stats.
    *
    * Counts are honest and cost one pass each:
    *  - `valid` (pre-dedup) rides the gold write via `observe()` — no
    *    rescan, and the validity filter still pushes into the scan
    *    (the metrics node sits above it);
    *  - `input`/`malformed` come from the per-file diagnostic pass
    *    ([[CorpusIO.jsonlFileStats]]), which is also what populates
    *    `data_lineage` — counting parse errors is impossible in-band
    *    on the DROPMALFORMED read, so this scan would exist anyway.
    */
  def run(
      spark: SparkSession,
      silverGlobs: Seq[String],
      diamondGlobs: Seq[String],
      goldDir: String,
      seed: Long = 42L,
      ratios: Seq[(String, Double)] = Split.defaultRatios): UnifyStats = {
    val layerGlobs = Seq("silver" -> silverGlobs, "diamond" -> diamondGlobs)
      .filter(_._2.nonEmpty)
    val layers = layerGlobs.map { case (layer, globs) =>
      CorpusIO.readJsonl(spark, globs, layer)
    }
    val validObs = org.apache.spark.sql.Observation()
    val valid = validRecords(layers).observe(validObs, count(lit(1)).as("n"))
    val gold = withSplit(dedupBest(valid), seed, ratios).cache()
    try {
      CorpusIO.writeJsonl(gold, goldDir, partitionByCols = Seq("split"))
      // one aggregation pass for the run-stats rollup (A12)
      val r = gold.agg(
        count(lit(1)).as("n"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("train"),
        sum(when(col("split") === "validation", 1L).otherwise(0L)).as("validation"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("test"),
        count(col("nah")).as("nah"),
        count(col("myn")).as("myn")).head()
      val validCount = validObs.get("n").asInstanceOf[Long]
      val sources = layerGlobs.flatMap { case (layer, globs) =>
        CorpusIO.jsonlFileStats(spark, globs).collect().map(row =>
          SourceIngest(row.getAs[String]("file"), layer, row.getAs[Long]("lines"),
            row.getAs[Long]("parsed"), row.getAs[Long]("malformed")))
      }
      UnifyStats(sources.map(_.parsed).sum, validCount, r.getLong(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        sources.map(_.malformed).sum, sources)
    } finally gold.unpersist()
  }
}
