package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §2.3 J4 + the training-data
  * extension surface): approximate-nearest-neighbor over an
  * `ArrayType(FloatType)` embedding column.
  *
  * The reference encodes both corpus sides with LaBSE and does a
  * Faiss `IndexFlatIP` k=1 search thresholded at 0.85
  * (/root/reference/pipeline/alignment/aligner.py:15-52). Spark-first
  * re-expression:
  *
  *  - [[cosine]] — pure Column math (`aggregate`/`zip_with`), stays in
  *    codegen, no UDF.
  *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query
  *    side, evaluate cosine per pair, window top-k. One shuffle (the
  *    window) on the query id; the join itself is broadcast so the
  *    100-TB corpus side streams.
  *  - [[lshTopK]] — scale path: random-hyperplane LSH bucketing cuts
  *    candidates from O(n·m) to the colliding buckets; same final
  *    rank-and-keep. Probing multiple hash tables recovers recall.
  */
object Similarity {

  /** Cosine similarity between two float-array columns (double math). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    when(na === 0 || nb === 0, lit(0.0d)).otherwise(dot / (na * nb))
  }

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** Exact top-k neighbors for every row of `queries` against `corpus`.
    * Query side is broadcast (ANN queries are batched and small
    * relative to the corpus); corpus streams through the broadcast
    * join with no shuffle until the per-query window. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      selfExclude: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val joined = c.join(broadcast(q),
      if (selfExclude) col("corpus_id") =!= col("query_id") else lit(true))
    val scored = joined.withColumn("sim", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Random-hyperplane signature: `bits` sign bits from seeded
    * pseudo-random hyperplanes. Deterministic in (seed, dim). The
    * hyperplane components are derived from xxhash64(seed, bit, dim
    * index) — no stored model object needed, so the same signature is
    * computable on any executor without a broadcast. */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val sigBits = (0 until bits).map { b =>
      // pseudo-random ±1 hyperplane for bit b (component j = sign of hash)
      val contrib = (0 until dim).map { j =>
        val sign = if (scala.util.hashing.byteswap64(seed ^ (b.toLong << 32) ^ j) < 0) -1.0 else 1.0
        element_at(vec, j + 1) * lit(sign)
      }.reduce(_ + _)
      when(contrib > 0, lit(1L)).otherwise(lit(0L)) * lit(1L << b)
    }
    sigBits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: join corpus and queries on matching hyperplane
    * bucket in any of `tables` independent signatures, then exact
    * cosine + window top-k within candidates. Equi-join on the bucket
    * key ⇒ hash-partitioned shuffle join, no broadcast needed at any
    * scale. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int, bits: Int = 12, tables: Int = 4): DataFrame = {
    val withSig = (df: DataFrame, side: String) => {
      val sigs = (0 until tables).map(t =>
        struct(lit(t).as("t"), hyperplaneSignature(col(vecCol), dim, bits, seed = 42L + t).as("sig")))
      df.select(col(idCol).as(s"${side}_id"), col(vecCol).as(s"__${side}v"),
        explode(array(sigs: _*)).as("__bucket"))
    }
    val c = withSig(corpus, "corpus")
    val q = withSig(queries, "query")
    val candidates = c.join(q, c("__bucket") === q("__bucket") && col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), col("__corpusv"), col("__queryv"))
      .dropDuplicates("query_id", "corpus_id")
    val scored = candidates.withColumn("sim", cosine(col("__corpusv"), col("__queryv")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Threshold similarity self-join: all pairs (a<b) with cosine ≥ t.
    * Exact (cross-join) — the LSH variant above is the scale path. */
  def similarPairs(df: DataFrame, idCol: String, vecCol: String, t: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("__va"), col("__vb")))
      .filter(col("sim") >= t)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the corpus,
    * queries probe their `nProbe` nearest centroids, exact cosine
    * rerank within the probed cells.
    *
    * Scale shape: centroids (k × dim floats) broadcast to assign cells
    * in a narrow map; the candidate join is a hash equi-join on
    * `cell` — corpus cells are disjoint so each query scans ~nProbe/k
    * of the corpus. Seeded k-means ⇒ deterministic cells.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

    val train = corpus.select(col(idCol), array_to_vector(col(vecCol)).as("__features"))
    val km = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("__cell")
    val model = km.fit(train)

    val corpusCells = model.transform(train)
      .select(col(idCol).as("corpus_id"), col("__cell").as("cell"),
        vector_to_array(col("__features")).as("__cv"))

    // rank each query's centroids, keep the nProbe nearest (by cosine)
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray)
    }.toSeq
    val centroidDf = corpus.sparkSession.createDataFrame(centroids)
      .toDF("cell", "__centroid")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("__qv"))
    val probed = q.join(broadcast(centroidDf), lit(true))
      .withColumn("__csim", cosine(col("__qv"), col("__centroid")))
      .withColumn("__crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("__csim"), asc("cell"))))
      .filter(col("__crank") <= nProbe)
      .select(col("query_id"), col("__qv"), col("cell"))

    val scored = corpusCells.join(probed, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("__cv").cast("array<double>"), col("__qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }
}
