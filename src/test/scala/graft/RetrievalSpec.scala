package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffle join spark spark"),
    (2L, "join join join join join join join join"),
    (3L, "the quick brown fox jumps over the lazy dog"),
    (4L, "spark"),
    (5L, "  Spark   SHUFFLE  "), // case/whitespace-insensitive tokenization
    (6L, "")).toDF("doc_id", "text")

  test("bm25TopK ranks docs matching more/rarer query terms first") {
    val hits = Retrieval.bm25TopK(corpus, "doc_id", col("text"),
      Seq("spark", "shuffle"), k = 10).collect()
    val ids = hits.map(_.getLong(0))
    // docs 3 and 6 contain neither term and must not appear
    assert(!ids.contains(3L) && !ids.contains(6L))
    assert(ids.toSet == Set(1L, 4L, 5L))
    // doc 5 matches both terms in a 2-token doc: best score
    assert(ids.head == 5L)
    // scores strictly ordered desc, ties broken by id asc
    val scores = hits.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("bm25TopK matches a hand-computed single-term score") {
    // query {spark}: N=6, df=3 (docs 1,4,5); avgdl=(5+8+9+1+2+0)/6
    val n = 6.0; val dfv = 3.0; val avgdl = 25.0 / 6.0
    val idf = math.log(1 + (n - dfv + 0.5) / (dfv + 0.5))
    def s(tf: Double, dl: Double): Double = {
      val raw = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
      math.rint(raw * 1e4) / 1e4
    }
    val got = Retrieval.bm25TopK(corpus, "doc_id", col("text"), Seq("spark"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 4L, 5L))
    assert(math.abs(got(1L) - s(3, 5)) < 1e-9)
    assert(math.abs(got(4L) - s(1, 1)) < 1e-9)
    assert(math.abs(got(5L) - s(1, 2)) < 1e-9)
  }

  test("bm25TopK respects k with deterministic tie-break") {
    val top1 = Retrieval.bm25TopK(corpus, "doc_id", col("text"),
      Seq("join"), k = 1).collect()
    assert(top1.length == 1)
    assert(top1.head.getLong(0) == 2L) // highest tf wins
  }

  test("query terms absent from the corpus contribute nothing") {
    val hits = Retrieval.bm25TopK(corpus, "doc_id", col("text"),
      Seq("zzz_nonexistent", "shuffle"), k = 10).collect()
    assert(hits.map(_.getLong(0)).toSet == Set(1L, 5L))
  }
}
