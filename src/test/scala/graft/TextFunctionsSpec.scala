package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.text

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("s").select(c.as("r")).head().getString(0)

  test("unicode_nfc composes decomposed macrons (zero-tolerance invariant)") {
    // "ā" as 'a' + COMBINING MACRON must normalize to precomposed U+0101
    val decomposed = "ā ē"
    assert(one(text.unicode_nfc(col("s")), decomposed) === "ā ē")
  }

  test("unicode_nfc preserves already-normalized macron text verbatim") {
    val s = "Piyali, quēn timotlaneltoquia? āēīōū ĀĒĪŌŪ"
    assert(one(text.unicode_nfc(col("s")), s) === s)
  }

  test("unicode_nfc is idempotent") {
    val samples = Seq("ā", "ñ", "ñ", "k'iin", "ʼ", "¿¡ñ", "tlazohcāmati")
    for (s <- samples) {
      val once = one(text.unicode_nfc(col("s")), s)
      val twice = one(text.unicode_nfc(text.unicode_nfc(col("s"))), s)
      assert(once === twice, s"not idempotent on $s")
    }
  }

  test("unicode_nfc null-safe") {
    val r = Seq[Option[String]](None).toDF("s")
      .select(text.unicode_nfc(col("s")).as("r")).head()
    assert(r.isNullAt(0))
  }

  test("saltillo normalization maps all four variants to U+02BC") {
    assert(one(text.normalize_saltillo(col("s")), "a'b a’b a`b aʔb") === "aʼb aʼb aʼb aʼb")
  }

  test("glottal normalization reattaches detached ejectives") {
    assert(one(text.normalize_glottal_myn(col("s")), "k ʼiin") === "k'iin")
  }

  test("vowel-run clamp keeps exactly two, case-insensitive, macron-aware") {
    assert(one(text.clamp_vowel_runs(col("s")), "aaa") === "aa")
    assert(one(text.clamp_vowel_runs(col("s")), "niltzeee") === "niltzee")
    assert(one(text.clamp_vowel_runs(col("s")), "āāāā") === "āā")
    assert(one(text.clamp_vowel_runs(col("s")), "aa") === "aa")
  }

  test("typography normalization: dashes, quotes, ellipsis, nbsp") {
    assert(one(text.normalize_es_typography(col("s")), "«hola» — sí… “x” y") ===
      "\"hola\" - sí... \"x\" y")
  }

  test("collapse_ws collapses runs and trims") {
    assert(one(text.collapse_ws(col("s")), "  a\t\tb \n c ") === "a b c")
  }

  test("dedup_key preserves separator positions for nulls (F9 risk)") {
    val df = Seq(("a", null: String, "b"), ("a", "b", null: String)).toDF("x", "y", "z")
    val keys = df.select(text.dedup_key(col("x"), col("y"), col("z")).as("k"))
      .collect().map(_.getString(0))
    assert(keys(0) === "a||b" && keys(1) === "a|b|")
    assert(keys.distinct.length === 2, "null position must distinguish keys")
  }

  test("detect_lang heuristics") {
    val cases = Seq(
      "tlazohcāmati" -> "nah",      // macron
      "k'iin ch'en" -> "myn",       // ejectives
      "tlen tzin kwali" -> "nah",   // digraphs
      "¿cómo estás ñandú?" -> "es", // spanish punctuation
      "plain ascii text" -> null)
    for ((s, want) <- cases) {
      val got = Seq(s).toDF("s").select(text.detect_lang(col("s")).as("r")).head()
      assert((if (got.isNullAt(0)) null else got.getString(0)) === want, s"on '$s'")
    }
  }

  test("strip_artifacts removes urls and page markers") {
    assert(one(text.strip_artifacts(col("s")), "hola http://x.y/z mundo Página 12 fin") ===
      "hola mundo fin")
  }

  test("normalize_text full chain is idempotent per language") {
    for (lang <- Seq("nah", "myn", "es")) {
      val s = "  Tlazohcāmati,  ’ sí…  aaa "
      val once = one(text.normalize_text(col("s"), lang), s)
      val twice = one(text.normalize_text(text.normalize_text(col("s"), lang), lang), s)
      assert(once === twice, s"chain not idempotent for $lang")
    }
  }
}
