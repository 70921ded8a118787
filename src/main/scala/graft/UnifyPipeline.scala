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

  final case class UnifyStats(
      input: Long, valid: Long, deduped: Long,
      train: Long, validation: Long, test: Long,
      nahRecords: Long, mynRecords: Long)

  /** Run the full pipeline over already-loaded layer frames. */
  def unify(layers: Seq[DataFrame], seed: Long = 42L): DataFrame = {
    require(layers.nonEmpty, "no input layers")
    val unioned = layers.reduce(_.unionByName(_, allowMissingColumns = true))
    // raw validity pre-filter: a strict superset of the post-normalize
    // filter (normalization never turns null text non-null), expressed
    // on source columns so Catalyst pushes IsNotNull into the scan —
    // invalid rows never reach the normalization expressions
    val prefiltered = CorpusIO.validityFilter(unioned)
    val valid = CorpusIO.validityFilter(normalize(prefiltered))
    val deduped = dedupBest(valid)
    deduped.withColumn("split",
      Split.assign(text.dedup_key(col("es"), col("nah"), col("myn")), seed))
  }

  /** End-to-end: read layer directories, unify, write gold, return stats. */
  def run(
      spark: SparkSession,
      silverGlobs: Seq[String],
      diamondGlobs: Seq[String],
      goldDir: String,
      seed: Long = 42L): UnifyStats = {
    val layers = Seq(
      if (silverGlobs.nonEmpty) Some(CorpusIO.readJsonl(spark, silverGlobs, "silver")) else None,
      if (diamondGlobs.nonEmpty) Some(CorpusIO.readJsonl(spark, diamondGlobs, "diamond")) else None
    ).flatten
    val gold = unify(layers, seed).cache()
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
      val input = layers.map(_.count()).sum
      UnifyStats(input, r.getLong(0), r.getLong(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    } finally gold.unpersist()
  }
}
