package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Embed, Similarity}

/** The hashed-embedding kernel ([[graft.functions.FeatureHashEmbed]])
  * and the [[Embed]] operator surface: hash parity with an independent
  * Scala reference, code-point (not UTF-16) iteration, norm and
  * null/empty edge behavior, codegen participation, and the
  * end-to-end text→embed→kNN chain. */
class EmbedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Mod = graft.functions.FeatureHashEmbed.Mod

  /** Independent reference: same contract, different code shape
    * (codepoints materialized up front, functional fold). */
  private def refEmbed(tokens: Seq[String], dim: Int): Array[Double] = {
    def horner(w: String, mult: Long): Long =
      w.codePoints().toArray.foldLeft(0L)((h, cp) => (h * mult + cp) % Mod)
    val acc = new Array[Long](dim)
    tokens.foreach { t =>
      val b = (horner(t, 31) % dim).toInt
      acc(b) += (if (horner(t, 131) % 2 == 0) 1L else -1L)
    }
    val nrm = math.sqrt(acc.map(a => a.toDouble * a).sum)
    if (nrm == 0) new Array[Double](dim) else acc.map(_.toDouble / nrm)
  }

  private def engineEmbed(text: String, dim: Int = 8): Array[Double] =
    Embed.hashedEmbedding(Seq(Tuple1(text)).toDF("text"), col("text"), dim)
      .head().getSeq[Double](1).toArray

  test("kernel matches the independent reference on mixed-script tokens") {
    val texts = Seq(
      "the quick brown fox the fox",
      "Sr. López llegó — ¡ā ē 中文 token!",
      "a b c d e f g h i j k l m n o p",
      "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 astral 𝄞 clef")
    texts.foreach { t =>
      val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      assert(engineEmbed(t, 8) === refEmbed(toks, 8), s"text: $t")
      assert(engineEmbed(t, 64) === refEmbed(toks, 64), s"text: $t (dim 64)")
    }
  }

  test("astral-plane tokens hash by code point, not UTF-16 unit") {
    // "𝄞" is one code point (U+1D11E) but two UTF-16 chars; a charAt
    // loop would fold the surrogate halves separately and diverge
    // from DuckDB's unicode(substr(...)).
    val cp = 0x1D11E
    val expected1 = cp % Mod // Horner over the single code point
    val b = (expected1 % 8).toInt
    val v = engineEmbed("𝄞", 8)
    assert(math.abs(math.abs(v(b)) - 1.0) < 1e-15,
      "single astral token must land one ±1 in its code-point bucket")
  }

  test("unit norm for non-empty docs, zero vector for empty/null text") {
    val df = Seq("hello world", "", "   ", null).toVector
    val out = Embed.hashedEmbedding(
      df.map(Tuple1(_)).toDF("text"), col("text"), dim = 16)
      .select(col("embedding")).collect().map(_.getSeq[Double](0))
    val n0 = math.sqrt(out(0).map(x => x * x).sum)
    assert(math.abs(n0 - 1.0) < 1e-12, "non-empty doc must be unit norm")
    out.drop(1).foreach(v => assert(v.forall(_ == 0.0),
      "empty/whitespace/null text must embed as the zero vector, not null"))
  }

  test("opposite-sign collisions cancel (signed hashing, not counts)") {
    // dim 1: every token lands in bucket 0, so sign parity alone
    // decides. h2('a') = 97 (odd, -1), h2('b') = 98 (even, +1):
    // "a b" cancels to the zero vector, "a a" reinforces to ±1.
    assert(engineEmbed("a b", 1).toSeq === Seq(0.0),
      "opposite-parity collision must cancel")
    assert(engineEmbed("a a", 1).toSeq === Seq(-1.0),
      "same-token occurrences must reinforce (tf weighting), sign from parity")
  }

  test("embeddingRows is the dense rounded explode of hashedEmbedding") {
    val df = Seq((1L, "x y"), (2L, "")).toDF("doc_id", "text")
    val rows = Embed.embeddingRows(df, "doc_id", col("text"), dim = 4)
      .orderBy("doc_id", "dim").collect()
    assert(rows.length === 8, "2 docs x 4 dims, zeros included")
    assert(rows.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L, 3L, 0L, 1L, 2L, 3L))
    val dense = engineEmbed("x y", 4).map(x => math.rint(x * 1e6) / 1e6)
    // round-half-up differences from rint can't trigger here (values
    // are ±1/sqrt(2) or 0); compare directly
    assert(rows.take(4).map(_.getDouble(2)).toSeq === dense.toSeq)
    assert(rows.drop(4).forall(_.getDouble(2) == 0.0))
  }

  test("kernel runs inside whole-stage codegen") {
    // a literal local relation constant-folds the whole projection
    // away — use the parquet table so a real plan survives
    val df = Embed.hashedEmbedding(
      Tables.documents(spark, "/root/testdata/sf0.001"), col("text"), dim = 8)
      .select("doc_id", "embedding")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("feature_hash_embed"), s"expression missing:\n$plan")
    assert(plan.startsWith("*"), "projection must be inside a WholeStageCodegen stage")
    assert(df.count() > 0)
  }

  test("feature_hash_embed is SQL-callable via FunctionRegistry") {
    GraftSession.registerFunctions(spark)
    val r = spark.sql(
      "SELECT feature_hash_embed(array('a', 'b'), 4) AS v").head().getSeq[Double](0)
    assert(r.length === 4)
    assert(math.abs(math.sqrt(r.map(x => x * x).sum) - 1.0) < 1e-12)
  }

  test("end-to-end: raw text to kNN with generated embeddings") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta epsilon"), // near-dup of 1
      (3L, "totally different words here now"),
      (4L, "alpha beta gamma")                // near-dup of 1
    ).toDF("doc_id", "text")
    val emb = Embed.hashedEmbedding(docs, col("text"), dim = 64)
    val knn = Similarity.bruteForceTopK(
      emb, emb.filter(col("doc_id") === 1), "doc_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(knn.map(_.getLong(1)).toSet === Set(2L, 4L),
      "nearest neighbors of doc 1 must be its vocabulary near-dups")
    assert(knn.forall(_.getDouble(2) > 0.7), "near-dups should score high")
  }
}
