package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE tokenizer: trainer determinism and hand-computed merges;
  * encode convention (min-rank-first, all L→R occurrences per step);
  * corpus-level invariants. The full encode loop is ALSO hash-gated
  * against an independent SQL replay (q111's recursive-CTE oracle). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("train learns the hand-computed merge sequence") {
    // words: aa ×2, ab ×1 → pairs (a,a):2 (a,b):1 → merge (a,a);
    // then only ab's (a,b):1 remains → merge (a,b); then pair space
    // is exhausted and training stops early.
    val df = Seq("aa aa ab").toDF("text")
    val m = Bpe.train(df, col("text"), numMerges = 5)
    assert(m.merges.map(_.toSeq).toSeq === Seq(Seq("a", "a"), Seq("a", "b")))
  }

  test("non-BMP text splits on code points: no lone surrogates, merges are valid Unicode") {
    // 𝄞 (U+1D11E, a surrogate pair): (𝄞,𝄞) is adjacent twice in the
    // word, (𝄞,x) once, so the top merge is the WHOLE code point pair
    // — never half-surrogates (a charAt split would count pairs of
    // lone 0xD834/0xDD1E units instead)
    val word = "𝄞𝄞𝄞x"
    val m = Bpe.train(Seq(s"$word $word").toDF("text"), col("text"), numMerges = 1)
    assert(m.merges.length === 1)
    assert(m.merges.head.toSeq === Seq("𝄞", "𝄞"))
    // every learned symbol is well-formed UTF-16 (round-trips bytes)
    m.merges.flatten.foreach { s =>
      assert(new String(s.getBytes("UTF-8"), "UTF-8") === s, s"mangled symbol")
    }
    // the native encoder agrees: L→R non-overlapping merge
    val pieces = Seq(word).toDF("t")
      .select(m.piecesOfText(col("t")).as("p"))
      .head().getSeq[String](0)
    assert(pieces === Seq("𝄞𝄞", "𝄞", "x"))
  }

  test("encode applies merges min-rank-first over all occurrences") {
    val model = Bpe.Model(Array(
      Array("l", "o"), Array("lo", "w"), Array("e", "r")))
    val out = Seq("low lower", "aaa", "newest")
      .toDF("text")
      .select(model.piecesOfText(col("text")).as("p"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("low", "low", "er"))
    assert(out(1) === Seq("a", "a", "a"), "no (a,a) rule → stays split")
    assert(out(2) === Seq("n", "e", "w", "e", "s", "t"))
    // all L→R non-overlapping occurrences merge in ONE step
    val m2 = Bpe.Model(Array(Array("a", "b")))
    val abab = Seq("abab").toDF("text")
      .select(m2.piecesOfText(col("text")).as("p")).as[Seq[String]].head()
    assert(abab === Seq("ab", "ab"))
    val aaa = Bpe.Model(Array(Array("a", "a")))
    val fourA = Seq("aaaa aaa").toDF("text")
      .select(aaa.piecesOfText(col("text")).as("p")).as[Seq[String]].head()
    assert(fourA === Seq("aa", "aa", "aa", "a"), "L→R non-overlap: aaaa→aa aa, aaa→aa a")
  }

  test("corpus invariants: pieces rebuild words; counts bounded; deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val model = Bpe.train(docs, col("text"), numMerges = 40)
    val model2 = Bpe.train(docs, col("text"), numMerges = 40)
    assert(model.merges.map(_.toSeq).toSeq === model2.merges.map(_.toSeq).toSeq,
      "training is deterministic")

    val words = docs.select(
      filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "").as("ws"))
    val check = words.select(
      concat_ws("", flatten(transform(col("ws"),
        w => array(w)))).as("joined_words"),
      concat_ws("", model.pieces(col("ws"))).as("joined_pieces"),
      size(col("ws")).as("nw"),
      size(model.pieces(col("ws"))).as("np"),
      length(concat_ws("", col("ws"))).as("nc"))
    assert(check.filter(col("joined_words") =!= col("joined_pieces")).count() === 0,
      "pieces concatenate back to the exact words")
    assert(check.filter(col("np") < col("nw") || col("np") > col("nc")).count() === 0,
      "word count <= token count <= char count")
    // merging actually happened (tokens strictly under chars overall)
    val sums = check.agg(sum("np").as("np"), sum("nc").as("nc")).head()
    assert(sums.getLong(0) < sums.getLong(1))
  }
}
