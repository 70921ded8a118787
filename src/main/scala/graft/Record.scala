package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** The canonical multilingual corpus record (SURVEY §1.1): typed
  * `Dataset[Record]` view over the fixed 6-column schema
  * (/root/reference/src/models/schemas.py:84-137). Use the typed form
  * where compile-time field checks help (pipeline code); fall back to
  * DataFrame where schema is dynamic (readers, generic operators).
  */
final case class Record(
    es: Option[String],
    nah: Option[String],
    myn: Option[String],
    source: String,
    layer: String,
    origin_file: Option[String]) {

  /** Validity predicate (schemas.py:173-175): Spanish pivot present
    * AND at least one indigenous translation. */
  def isValid: Boolean = es.exists(_.nonEmpty) && (nah.exists(_.nonEmpty) || myn.exists(_.nonEmpty))

  def completeness: Int = Seq(es, nah, myn).count(_.isDefined)
}

object Record {
  /** Typed view over a frame with the canonical columns. */
  def from(df: DataFrame): Dataset[Record] = {
    import df.sparkSession.implicits._
    df.select("es", "nah", "myn", "source", "layer", "origin_file").as[Record]
  }
}
