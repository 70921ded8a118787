package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DupClusters, Retrieval, Similarity, Split}

/** Degenerate-input hardening: every operator must behave sanely on
  * empty and single-row frames — a library user's first pipeline run
  * is usually against an empty dev bucket. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def oneDoc: DataFrame =
    Seq((1L, "a single document")).toDF("doc_id", "text")
  private def emptyVecs: DataFrame =
    Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")

  test("exact dedup family on empty and single-row frames") {
    assert(Dedup.keepBest(emptyDocs, col("doc_id"), Seq(col("doc_id"))).count() === 0)
    assert(Dedup.keepBestWindow(oneDoc, col("text"), Seq(col("doc_id").asc)).count() === 1)
    assert(Dedup.duplicateStats(oneDoc, Seq("text")).count() === 1)
  }

  test("minhash dedup family on empty and single-row frames") {
    assert(Dedup.minhashDedup(emptyDocs, "doc_id", col("text")).count() === 0)
    assert(Dedup.minhashDedup(oneDoc, "doc_id", col("text")).count() === 1)
    assert(Dedup.simhashDedup(oneDoc, "doc_id", col("text")).count() === 1)
    val sigs = Dedup.minhashSignatures(emptyDocs, "doc_id", col("text"))
    assert(Dedup.minhashDedupAgainst(oneDoc, "doc_id", col("text"), sigs).count() === 1)
  }

  test("jaccard joins on empty and single-row frames") {
    assert(Dedup.jaccardPairs(emptyDocs, "doc_id", col("text"), t = 0.8).count() === 0)
    assert(Dedup.jaccardPairs(oneDoc, "doc_id", col("text"), t = 0.8).count() === 0)
    assert(Dedup.jaccardJoin(oneDoc, "doc_id", col("text"),
      emptyDocs, "doc_id", col("text"), t = 0.5).count() === 0)
    assert(Dedup.decontaminate(oneDoc, "doc_id", col("text"),
      emptyDocs, "doc_id", col("text")).count() === 1)
  }

  test("similarity search on empty frames") {
    assert(Similarity.similarPairs(emptyVecs, "vec_id", "embedding", t = 0.5).count() === 0)
    assert(Similarity.similarPairsApprox(emptyVecs, "vec_id", "embedding", t = 0.5).count() === 0)
    assert(Similarity.bruteForceTopK(emptyVecs, emptyVecs, "vec_id", "embedding", 5).count() === 0)
    assert(Dedup.embeddingDedup(emptyVecs, "vec_id", "embedding").count() === 0)
  }

  test("connected components on empty edge sets (both paths)") {
    val vs = Seq(1L, 2L).toDF("id")
    val noEdges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val fast = DupClusters.connectedComponents(vs, noEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === Map(1L -> 1L, 2L -> 2L))
    val loop = DupClusters.connectedComponents(vs, noEdges, driverEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loop === fast)
  }

  test("retrieval and sampling on empty frames") {
    assert(Retrieval.bm25TopK(emptyDocs, "doc_id", col("text"), Seq("spark"), 5).count() === 0)
    assert(Split.budgetSample(emptyDocs, col("text"), col("doc_id"), length(col("text")), 100L).count() === 0)
    assert(Split.stratified(oneDoc, col("text"), col("doc_id")).count() === 1)
  }

  test("round-3 curation operators on empty and single-row frames") {
    assert(Dedup.dedupLines(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.dedupLines(oneDoc, "doc_id", "text")
      .select("text").as[String].head() === "a single document")
    assert(Dedup.simhashPairs(emptyDocs, "doc_id", col("text")).count() === 0)
    assert(Dedup.simhashNearDedup(oneDoc, "doc_id", col("text")).count() === 1)
    assert(graft.operators.Stats.dupNgramProfile(emptyDocs, "doc_id", col("text")).count() === 0)
    assert(graft.operators.Stats.quantileProfile(emptyDocs, col("doc_id"), Seq(0.5)).count() === 1)
    assert(Split.packSequences(emptyDocs, col("doc_id"), length(col("text")), 100L).count() === 0)
    val packedOne = Split.packSequences(oneDoc, col("doc_id"), length(col("text")), 100L)
      .select("pack_id", "pack_offset").as[(Long, Long)].head()
    assert(packedOne === ((0L, 0L)))
  }

  test("fuzzy spark.ml dedup on single-row frame") {
    assert(Dedup.fuzzyDedup(oneDoc, "doc_id", col("text")).count() === 1)
  }
}
