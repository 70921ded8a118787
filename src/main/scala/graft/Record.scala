package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, lit}

/** Nested per-record metadata (SURVEY §1.1,
  * /root/reference/src/models/schemas.py:25-73): identity, provenance
  * and validation state. Maps to [[graft.sources.CorpusIO.metadataSchema]]. */
final case class RecordMeta(
    record_id: Option[String],
    created_at: Option[java.sql.Timestamp],
    dialect: Option[String],
    quality_score: Option[Double],
    is_validated: Option[Boolean])

/** The canonical multilingual corpus record (SURVEY §1.1): typed
  * `Dataset[Record]` view over the fixed schema
  * (/root/reference/src/models/schemas.py:84-137, category at :128-131).
  * Use the typed form where compile-time field checks help (pipeline
  * code); fall back to DataFrame where schema is dynamic (readers,
  * generic operators).
  */
final case class Record(
    es: Option[String],
    nah: Option[String],
    myn: Option[String],
    source: String,
    layer: String,
    origin_file: Option[String],
    category: Option[String] = None,
    metadata: Option[RecordMeta] = None) {

  /** Validity predicate (schemas.py:173-175): Spanish pivot present
    * AND at least one indigenous translation. */
  def isValid: Boolean = es.exists(_.nonEmpty) && (nah.exists(_.nonEmpty) || myn.exists(_.nonEmpty))

  def completeness: Int = Seq(es, nah, myn).count(_.isDefined)
}

object Record {
  /** Typed view over a frame with the canonical columns; category and
    * metadata are filled with nulls when the frame predates them. */
  def from(df: DataFrame): Dataset[Record] = {
    import df.sparkSession.implicits._
    val withCategory =
      if (df.columns.contains("category")) df
      else df.withColumn("category", lit(null).cast("string"))
    val withMeta =
      if (withCategory.columns.contains("metadata")) withCategory
      else withCategory.withColumn("metadata",
        lit(null).cast(graft.sources.CorpusIO.metadataSchema))
    withMeta.select(col("es"), col("nah"), col("myn"), col("source"),
      col("layer"), col("origin_file"), col("category"), col("metadata")).as[Record]
  }
}
