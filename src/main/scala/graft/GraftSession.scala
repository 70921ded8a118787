package graft

import org.apache.spark.sql.SparkSession

/** Canonical session configuration for the engine.
  *
  * Scale-relevant defaults:
  *  - AQE on (runtime partition coalescing + skew-join splitting);
  *  - shuffle partitions sized for the local[32] test harness — on a
  *    real cluster this is overridden to ~2-3× total cores;
  *  - UTC session timezone (oracle parity);
  *  - nanosAsLong so parquet TIMESTAMP(NANOS) sources load (Spark has
  *    no native nanos type; Tables.events converts to micros).
  *
  * Scan parallelism note: splits land on parquet row-group boundaries,
  * so a single-row-group file is one task no matter the config — lay
  * out production tables with row groups ≤ maxPartitionBytes. The
  * compute-heavy narrow expressions (CharNGrams, MinHashSig) are
  * native and cheap enough that a single-split scan is not a
  * bottleneck at test scale.
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    registerFunctions(spark)
    spark
  }

  /** Register graft's custom Catalyst expressions for SQL callers
    * (`SELECT unicode_nfc(col) FROM ...`). */
  def registerFunctions(spark: SparkSession): Unit = {
    import java.text.Normalizer
    import org.apache.spark.sql.graftbridge.bridge
    import graft.functions.UnicodeNormalize
    bridge.registerFunction(spark, "unicode_nfc",
      es => UnicodeNormalize(es.head, Normalizer.Form.NFC))
    bridge.registerFunction(spark, "unicode_nfkc",
      es => UnicodeNormalize(es.head, Normalizer.Form.NFKC))
    // `char_ngrams(text, n)` — sorted distinct n-grams; n must be a
    // foldable int literal (it parameterizes the generated code).
    bridge.registerFunction(spark, "char_ngrams",
      es => graft.functions.CharNGrams(es.head,
        es(1).eval().asInstanceOf[Int]))
    // `sorted_intersect_size(a, b)` over presorted string arrays.
    bridge.registerFunction(spark, "sorted_intersect_size",
      es => graft.functions.SortedIntersectSize(es.head, es(1)))
    // `vector_dot(a, b)` over double arrays.
    bridge.registerFunction(spark, "vector_dot",
      es => graft.functions.DotProduct(es.head, es(1)))
    // `sig_agree_count(a, b)` over equal-length bigint signatures.
    bridge.registerFunction(spark, "sig_agree_count",
      es => graft.functions.SigAgreeCount(es.head, es(1)))
    // `hyperplane_sig(vec, bits, seed)` — bits/seed must be foldable
    // int/long literals (they parameterize the signature family).
    bridge.registerFunction(spark, "hyperplane_sig",
      es => graft.functions.HyperplaneSig(es.head,
        es(1).eval().asInstanceOf[Int],
        es(2).eval() match { case i: Int => i.toLong; case l: Long => l }))
  }
}
