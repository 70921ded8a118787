package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{text => ftext, BpeEncode}

/** Byte-pair-encoding tokenizer — train on the corpus, encode as a
  * native expression (SURVEY §2.8 extension; the "BPE-ish token
  * counting" the reference estimates with a regex, done with actual
  * learned merges).
  *
  * Scale stance mirrors [[Pq]]: TRAINING is a metadata-scale problem —
  * classic BPE (Sennrich et al. 2016) learns from the word-frequency
  * DICTIONARY, not the raw corpus, so the distributed work is one
  * word-count aggregation (map-side combined) truncated to the
  * `maxVocab` most frequent words, and the merge loop runs driver-side
  * over that bounded dict. ENCODING is the corpus-scale operation: one
  * narrow map per row through [[graft.functions.BpeEncode]], the merge
  * table riding into codegen as a referenced object.
  *
  * Word semantics are the engine's standard: maximal non-whitespace
  * runs of the lowercased trimmed text (the "" artifacts of Spark's
  * split are filtered — see the verify-skill parity note). No
  * end-of-word marker: words are pre-tokenized by whitespace and
  * pieces never cross a word boundary (GPT-style pretokenized BPE).
  */
object Bpe {

  /** Ordered merge rules; rank = index. */
  final case class Model(merges: Array[Array[String]]) {
    require(merges.forall(_.length == 2), "each merge is a (left, right) pair")

    /** Subword pieces of a lowercased whitespace word array. */
    def pieces(wordsCol: Column): Column =
      ftext.expr2col(BpeEncode(ftext.col2expr(wordsCol), merges))

    /** Pieces of a raw text column (standard word split). */
    def piecesOfText(textCol: Column): Column =
      pieces(filter(split(lower(trim(textCol)), "\\s+"), w => w =!= ""))

    /** Learned-tokenizer token count of a text column. */
    def tokenCount(textCol: Column): Column = size(piecesOfText(textCol))
  }

  /** Train `numMerges` merge rules from `df`'s word-frequency
    * dictionary. Deterministic: the dict is the `maxVocab` most
    * frequent words (count desc, word asc), and pair-count ties break
    * lexicographically. One aggregation job; the loop is driver-side
    * over ≤ maxVocab entries. */
  def train(df: DataFrame, textCol: Column, numMerges: Int,
      maxVocab: Int = 65536): Model = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val dict: Array[(Array[String], Long)] = Dedup.spreadWide(
        df.select(textCol.as("__t")))
      .select(explode(split(lower(trim(col("__t"))), "\\s+")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__n"))
      .orderBy(desc("__n"), asc("__w"))
      .limit(maxVocab)
      .collect()
      .map(r => (splitCodePoints(r.getString(0)), r.getLong(1)))

    val merges = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    val words: Array[Array[String]] = dict.map(_._1)
    val freqs: Array[Long] = dict.map(_._2)
    var it = 0
    var exhausted = false
    while (it < numMerges && !exhausted) {
      // count adjacent pairs weighted by word frequency
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var w = 0
      while (w < words.length) {
        val syms = words(w)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + freqs(w))
          i += 1
        }
        w += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count, ties lexicographic — deterministic on any JVM
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += Array(best._1, best._2)
        w = 0
        while (w < words.length) {
          val syms = words(w)
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            has = syms(i) == best._1 && syms(i + 1) == best._2
            i += 1
          }
          if (has) {
            val next = scala.collection.mutable.ArrayBuffer.empty[String]
            i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                next += best._1 + best._2; i += 2
              } else { next += syms(i); i += 1 }
            }
            words(w) = next.toArray
          }
          w += 1
        }
      }
      it += 1
    }
    Model(merges.toArray)
  }

  /** Initial BPE alphabet = Unicode CODE POINTS, not UTF-16 code
    * units: a char-unit split would emit lone-surrogate "symbols" for
    * non-BMP text (emoji, CJK extensions) — invalid Unicode that
    * corrupts exported merge tables and diverges from any
    * codepoint-indexed replay (the q111 DuckDB oracle slices words by
    * code point). Mirrored by the native encoder
    * ([[graft.functions.BpeEncode]]). */
  private[graft] def splitCodePoints(s: String): Array[String] = {
    val out = new Array[String](s.codePointCount(0, s.length))
    var i = 0
    var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(j) = new String(Character.toChars(cp))
      j += 1
      i += Character.charCount(cp)
    }
    out
  }
}
