package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Similarity

/** Scratch diagnostic: hardNegativesAnn wall clock vs `bits` at a
  * given SF dir — the measurement behind the "fixed bits is the
  * fixed-cell-count mistake" guidance in its scaladoc. Not part of
  * the library surface.
  *
  * Usage: runMain graft.tools.AnnProbe <sfDir> <bits>[,<bits>...]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bitsList = args.lift(1).getOrElse("8,10,12,0").split(",").map(_.toInt)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .filter(!exists(col("embedding"), x => isnan(x)))
    emb.write.mode("overwrite").format("noop").save() // warm scan
    for (bits <- bitsList) {
      val t0 = System.nanoTime()
      val n = Similarity.hardNegativesAnn(emb, "vec_id", "embedding",
        lo = 0.3, hi = 0.8, k = 5, probeK = 40, bits = bits, tables = 4).count()
      println(f"BITS $bits: rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
