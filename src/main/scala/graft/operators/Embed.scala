package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{text, FeatureHashEmbed}

/** Embedding GENERATION: deterministic text→vector maps computed by
  * the engine itself, so the whole vector surface (kNN join, semantic
  * dedup, IVF/LSH/PQ — [[Similarity]], [[Dedup.semanticDedup]]) runs
  * end-to-end from raw text with no user-supplied model.
  *
  * The reference produces embeddings with LaBSE model inference
  * (reference pipeline/alignment/aligner.py:19-24) — out of engine
  * scope (a neural encoder is not a query operator, and the model
  * weights aren't data the engine owns). What IS in scope is the
  * training-free hashing-trick encoder (Weinberger et al. 2009): L2-
  * normalized signed bag-of-words in a `dim`-bucket hashed space.
  * Cosine in that space is a (biased-down, collision-noisy) estimate
  * of vocabulary overlap — good enough for candidate generation,
  * clustering QA, and as the drop-in vector column when a model-
  * produced one isn't available. Callers with real model embeddings
  * just skip this module; every downstream operator takes the vector
  * column by name.
  *
  * Scale: one native codegen expression per row
  * ([[graft.functions.FeatureHashEmbed]]) — map-side only, no
  * shuffle, no model broadcast, stays inside whole-stage codegen. A
  * 100 TB corpus embeds in a single scan at parquet-read speed; the
  * output adds 8·dim bytes/row, so pick `dim` by the downstream
  * budget (64 matches the testdata embeddings table).
  */
object Embed {

  /** Tokenization shared with the BM25/DSIR surface (lower, trim,
    * whitespace split — `Retrieval.wordTokens` semantics), but WITHOUT
    * the `filter(length > 0)` higher-order function: HOFs don't
    * code-generate and would drop the whole projection out of
    * whole-stage codegen, so the kernel skips empty tokens itself.
    * Nulls embed as the zero vector rather than null so downstream
    * explodes/joins never silently drop documents. */
  private def tokens(textCol: Column): Column =
    split(lower(trim(coalesce(textCol, lit("")))), "\\s+")

  /** Appends `outCol` (array<double>, length `dim`, unit L2 norm or
    * all-zero for token-less docs) computed from `textCol`. */
  def hashedEmbedding(
      df: DataFrame, textCol: Column, dim: Int = 64,
      outCol: String = "embedding"): DataFrame =
    df.withColumn(outCol,
      text.expr2col(FeatureHashEmbed(text.col2expr(tokens(textCol)), dim)))

  /** The exploded (id, dim, val) form — the export/oracle shape, one
    * row per dimension INCLUDING zeros (fixed-width consumers want
    * dense vectors; sparse consumers filter `val != 0` themselves). */
  def embeddingRows(
      df: DataFrame, idCol: String, textCol: Column, dim: Int = 64): DataFrame =
    hashedEmbedding(df, textCol, dim)
      .select(col(idCol), posexplode(col("embedding")).as(Seq("dim", "val")))
      .select(col(idCol), col("dim").cast("long").as("dim"),
        round(col("val"), 6).as("val"))
}
