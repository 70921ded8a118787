package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pq, Similarity}

class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val model = Pq.train(emb, "vec_id", "embedding", m = 16, ksub = 256)

  test("train is deterministic and shapes the codebook correctly") {
    val m2 = Pq.train(emb, "vec_id", "embedding", m = 16, ksub = 256)
    assert(model.codebook.sameElements(m2.codebook))
    assert(model.dsub * model.m === model.dim)
    assert(model.codebook.length === model.m * model.ksub * model.dsub)
  }

  test("codes are m bytes and encode deterministically") {
    val coded = Pq.encode(emb, "embedding", model)
    val rows = coded.select("vec_id", "pq_code").collect()
    assert(rows.forall(_.getSeq[Byte](1).length === model.m))
    val again = Pq.encode(emb, "embedding", model)
      .select("vec_id", "pq_code").collect()
    assert(rows.map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap ===
      again.map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap)
  }

  test("reconstruction error is small relative to vector norm") {
    val coded = Pq.encode(emb, "embedding", model)
    val err = Pq.reconstructionError(coded, "embedding", "pq_code", model).collect().head
    val meanNorm = emb
      .select(sqrt(Similarity.dot(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"))).as("n"))
      .agg(avg("n")).collect().head.getDouble(0)
    assert(err.getDouble(0) < meanNorm * 0.5,
      s"mean L2 err ${err.getDouble(0)} vs mean norm $meanNorm")
  }

  test("ADC self-score approximates 1 (cosine of a vector with its own code)") {
    val coded = Pq.encode(emb, "embedding", model)
    val relErr = coded
      .withColumn("adc",
        model.adcScore(col("pq_code"), model.lut(Pq.unit(col("embedding")))) / col("pq_norm"))
      .filter(!isnan(col("adc")))
      .select(abs(col("adc") - lit(1.0)).as("err"))
      .agg(avg(col("err"))).collect().head.getDouble(0)
    assert(relErr < 0.1, s"mean |selfcos - 1| = $relErr")
  }

  test("adcTopK recalls HIGH-similarity neighbors (the near-dup use case)") {
    // On a noise-dominated corpus (this fixture's max non-self cosine
    // is ~0.48), exact top-10 neighbors sit within hundredths of
    // cosine of each other — ill-conditioned for ANY lossy code (and
    // irrelevant). What PQ must preserve is the near-duplicate signal,
    // so synthesize it: perturbed copies of real vectors as queries,
    // whose true best corpus neighbor is their source at cosine ≈0.99.
    import spark.implicits._
    val base = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .filter { case (_, v) => v.forall(x => !x.isNaN) } // defensive; fixture has none
    val rnd = new scala.util.Random(7L)
    val queries = base.take(100).map { case (id, v) =>
      (id + 10000L, v.map(x => x + 0.03f * rnd.nextGaussian().toFloat))
    }.toSeq.toDF("vec_id", "embedding")
    val coded = Pq.encode(emb, "embedding", model)
    val approx = Pq.adcTopK(coded, queries, "vec_id", "pq_code", "embedding", model,
        k = 10, selfExclude = false)
      .select("query_id", "corpus_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val hit = approx.count { case (q, ids) => ids.contains(q - 10000L) }
    val rate = hit.toDouble / approx.size
    assert(rate >= 0.9, s"near-dup source recall $rate over ${approx.size} queries")
  }
}
