package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Scratch diagnostic: stage-by-stage cost of the banded MinHash path
  * at a given SF dir. Not part of the library surface.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, sfDir)
    docs.write.mode("overwrite").format("noop").save() // warm scan

    // 1. scan + normalize only
    timed("normalize") {
      docs.select(graft.functions.text.norm_key(col("text")).as("t"))
        .write.mode("overwrite").format("noop").save()
    }
    // 2. + shingle materialization (count chars to force full strings)
    timed("shingles") {
      docs.select(Dedup.shingles(graft.functions.text.norm_key(col("text")), 3).as("s"))
        .select(aggregate(col("s"), lit(0L), (a, x) => a + length(x)).as("n"))
        .agg(sum(col("n"))).write.mode("overwrite").format("noop").save()
    }
    // 3. + minhash signatures
    timed("signatures") {
      Dedup.minhashSignatures(docs, "doc_id", col("text"), 128, 3)
        .select(element_at(col("__sig"), 1))
        .write.mode("overwrite").format("noop").save()
    }
    // 4. full banded bucket count
    timed("banded_agg") {
      val sigs = Dedup.minhashSignatures(docs, "doc_id", col("text"), 128, 3)
      val r = 128 / 32
      sigs.select(col("doc_id"),
          explode(transform(sequence(lit(0), lit(31)),
            b => xxhash64(slice(col("__sig"), b * r + 1, lit(r))))).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)))
        .write.mode("overwrite").format("noop").save()
    }
    // 5. candidate pair enumeration (bucket self-join + verify).
    // NOTE: the standalone minhashCandidates entry point leaves the
    // signed frame UNCACHED (its plan reads it from three subplans),
    // so this stage carries ~3x the signature pass on top of the join
    // cost — compare against full_dedup (which caches) for the
    // operator's real steady-state, and against `signatures` to
    // subtract the duplicated narrow-map work.
    timed("candidates") {
      Dedup.minhashCandidates(docs, "doc_id", col("text"),
          threshold = 0.5, numPerm = 128, bands = 32, shingleSize = 3,
          maxBucketSize = 1024)
        .write.mode("overwrite").format("noop").save()
    }
    // 6. the full operator (candidates + left_anti)
    timed("full_dedup") {
      Dedup.minhashDedup(docs, "doc_id", col("text"),
          threshold = 0.5, numPerm = 128, bands = 32, shingleSize = 3)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
