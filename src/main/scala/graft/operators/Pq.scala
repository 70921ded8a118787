package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{text => ftext, PqAssignCode, PqAdcScore, PqDecode, PqLut}

/** Product quantization for embedding columns — the compressed-domain
  * ANN path of the similarity family (SURVEY §2.3 J4 [E]).
  *
  * A `dim`-dim fp32/fp64 vector becomes `m` one-byte codes: the vector
  * is split into `m` subvectors, each assigned to the nearest of
  * `ksub` (≤256) per-subspace centroids. At 64-dim → 8 bytes that is a
  * 32× storage cut vs fp32 (vs 4× for [[Similarity.quantizeInt8]]),
  * and queries rank candidates WITHOUT decompression: an asymmetric-
  * distance lookup table (`m × ksub` dots of the query's subvectors
  * against the codebook) turns scoring into `m` table reads per corpus
  * row.
  *
  * Codebooks train driver-side on a deterministic bounded sample
  * (Lloyd iterations per subspace) — the same engineering stance as
  * Faiss: PQ training is a metadata-scale problem (sample × dim), the
  * corpus-scale work is the one narrow ENCODE map. At 100 TB the
  * encode pass streams, the codebook (m·ksub·dsub doubles) rides into
  * codegen as a referenced object, and the scored scan reads 8-byte
  * codes instead of 256-byte vectors — memory-bandwidth-bound either
  * way, so the 32× size cut is a ~32× scan-rate win.
  *
  * Reference analog: the Faiss IndexFlatIP alignment search
  * (/root/reference/pipeline/alignment/aligner.py:15-52), re-expressed
  * with the index's compressed variant (IVFPQ's PQ half) as native
  * Spark expressions.
  */
object Pq {

  /** Trained product quantizer: flattened codebook
    * `(sub s, centroid k) → [s*ksub+k)*dsub, +dsub)`. */
  case class Model(codebook: Array[Double], dim: Int, m: Int, ksub: Int) {
    require(dim % m == 0, "m must divide dim")
    val dsub: Int = dim / m

    def encode(vec: Column): Column =
      ftext.expr2col(PqAssignCode(ftext.col2expr(vec.cast("array<double>")), codebook, m, ksub))

    def lut(queryVec: Column): Column =
      ftext.expr2col(PqLut(ftext.col2expr(queryVec.cast("array<double>")), codebook, m, ksub))

    def adcScore(codes: Column, lut: Column): Column =
      ftext.expr2col(PqAdcScore(ftext.col2expr(codes), ftext.col2expr(lut), ksub))

    def decode(codes: Column): Column =
      ftext.expr2col(PqDecode(ftext.col2expr(codes), codebook, m, ksub))
  }

  /** Train per-subspace codebooks with Lloyd iterations on a
    * deterministic sample (≤ `maxSample` rows by seeded hash order —
    * bounded METADATA collect, not a data collect; codebook quality
    * needs a representative sample, not the corpus). Empty clusters
    * keep their previous centroid. Deterministic in (seed, sample). */
  def train(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int = 256, iters: Int = 10,
      maxSample: Int = 65536, seed: Long = 42L): Model = {
    val sample = df
      .select(col(idCol).as("__id"), unit(col(vecCol)).as("__v"))
      .orderBy(xxhash64(col("__id"), lit(seed)))
      .limit(maxSample)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "cannot train PQ on an empty frame")
    val dim = sample.head.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val k = math.min(ksub, sample.length)
    val cb = new Array[Double](m * ksub * dsub)

    var s = 0
    while (s < m) {
      // init: first k sample subvectors in hash order (already shuffled)
      var i = 0
      while (i < k) {
        System.arraycopy(sample(i), s * dsub, cb, (s * ksub + i) * dsub, dsub)
        i += 1
      }
      var it = 0
      while (it < iters) {
        val sums = Array.ofDim[Double](k, dsub)
        val counts = new Array[Int](k)
        var r = 0
        while (r < sample.length) {
          val v = sample(r)
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            val base = (s * ksub + c) * dsub
            var d = 0.0
            var j = 0
            while (j < dsub) {
              val diff = v(s * dsub + j) - cb(base + j); d += diff * diff; j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < dsub) { sums(best)(j) += v(s * dsub + j); j += 1 }
          r += 1
        }
        var c = 0
        while (c < k) {
          if (counts(c) > 0) {
            var j = 0
            while (j < dsub) { cb((s * ksub + c) * dsub + j) = sums(c)(j) / counts(c); j += 1 }
          }
          c += 1
        }
        it += 1
      }
      s += 1
    }
    Model(cb, dim, m, ksub)
  }

  /** Unit-normalize an array<double> column (zero vectors pass
    * through). SPHERICAL encoding: codebooks quantize DIRECTIONS, so
    * quantization error is uniform on the sphere instead of absolute —
    * without this, small-norm vectors are destroyed (an absolute
    * reconstruction error of 0.2 swamps a vector of norm 0.3) and
    * cosine recall collapses exactly on them. */
  private[graft] def unit(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val n = sqrt(Similarity.dot(v, v))
    when(n === 0, v).otherwise(transform(v, x => x / n))
  }

  /** Encode a corpus: adds `codeCol` (`array<tinyint>`, m bytes — the
    * PQ code of the UNIT-normalized vector) and `normCol` (‖v̂‖, the
    * reconstruction's norm, ≈1; stored so cosine ranking can normalize
    * exactly). One narrow map — THE corpus-scale operation of the PQ
    * pipeline. */
  def encode(df: DataFrame, vecCol: String, model: Model,
      codeCol: String = "pq_code", normCol: String = "pq_norm"): DataFrame = {
    val decoded = model.decode(col(codeCol))
    Dedup.spreadWide(df)
      .withColumn(codeCol, model.encode(unit(col(vecCol))))
      .withColumn(normCol, sqrt(Similarity.dot(decoded, decoded)))
  }

  /** ADC top-k by approximate COSINE: `adc(q, code) / (‖q‖·‖v̂‖)` —
    * the asymmetric inner product against the reconstruction,
    * normalized by the query norm and the stored reconstruction norm,
    * so ranking agrees with the exact cosine rankers
    * ([[Similarity.bruteForceTopK]]) instead of silently switching
    * metric on non-unit corpora. Same plan shape as bruteForceTopK —
    * queries (with their LUTs, computed ONCE per query in a narrow
    * map) broadcast; the corpus side streams CODES + one norm double
    * per row (never the vectors); one window shuffle carries
    * (ids, score). Exact-metric rerank of the few survivors: join
    * corpus vectors back on the top-k output ids. */
  def adcTopK(
      codes: DataFrame, queries: DataFrame,
      idCol: String, codeCol: String, queryVecCol: String,
      model: Model, k: Int, selfExclude: Boolean = true,
      normCol: String = "pq_norm"): DataFrame = {
    val c = codes.select(col(idCol).as("corpus_id"), col(codeCol).as("__code"),
      col(normCol).as("__cn"))
    val q = queries.select(col(idCol).as("query_id"),
      model.lut(unit(col(queryVecCol))).as("__lut"))
    val joined = c.join(broadcast(q),
      if (selfExclude) col("corpus_id") =!= col("query_id") else lit(true))
    val cosArg = when(col("__cn") === 0, lit(0.0d))
      .otherwise(model.adcScore(col("__code"), col("__lut")) / col("__cn"))
    val scored = joined.select(col("query_id"), col("corpus_id"), cosArg.as("adc"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("adc"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("adc"), 6).as("adc"), col("rank"))
  }

  /** Mean/max L2 reconstruction error of the codes vs the original
    * vectors — the audit aggregate for choosing (m, ksub). */
  def reconstructionError(df: DataFrame, vecCol: String, codeCol: String,
      model: Model): DataFrame = {
    val diff = zip_with(unit(col(vecCol)), model.decode(col(codeCol)),
      (a, b) => (a - b) * (a - b))
    val err = sqrt(aggregate(diff, lit(0.0d), (acc, x) => acc + x))
    df.select(err.as("__e"))
      .agg(round(avg(col("__e")), 6).as("mean_l2_err"),
        round(max(col("__e")), 6).as("max_l2_err"),
        count(lit(1)).as("n"))
  }
}
