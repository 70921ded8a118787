package graft

import java.text.Normalizer

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` entry point: lets ANY session pick up the
  * engine's native SQL functions without calling
  * [[GraftSession.registerFunctions]] — e.g. a thin SQL client or a
  * spark-submit job configured with
  *
  * {{{ --conf spark.sql.extensions=graft.GraftExtensions }}}
  *
  * The injected builders are the canonical function registry
  * ([[GraftExtensions.functions]]); `GraftSession` registers the same
  * list per-session, so both paths expose an identical SQL surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    ext.injectOptimizerRule(session => graft.plans.JaccardJoinRewrite(session))
    ext.injectOptimizerRule(session => graft.plans.CosineJoinRewrite(session))
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRewrite(session))
    ext.injectOptimizerRule(session => graft.plans.HammingJoinRewrite(session))
  }
}

object GraftExtensions {

  /** name → Catalyst expression builder, the single source of truth
    * for the engine's SQL-function surface. Literal-parameterized
    * functions (`char_ngrams`'s n, `hyperplane_sig`'s bits/seed)
    * require foldable arguments — they parameterize generated code. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "unicode_nfc" ->
      ((es: Seq[Expression]) => graft.functions.UnicodeNormalize(es.head, Normalizer.Form.NFC)),
    "unicode_nfkc" ->
      ((es: Seq[Expression]) => graft.functions.UnicodeNormalize(es.head, Normalizer.Form.NFKC)),
    "char_ngrams" ->
      ((es: Seq[Expression]) => graft.functions.CharNGrams(es.head,
        es(1).eval().asInstanceOf[Int])),
    "word_ngrams" ->
      ((es: Seq[Expression]) => graft.functions.WordNGrams(es.head,
        es(1).eval().asInstanceOf[Int])),
    "winnow_fps" ->
      ((es: Seq[Expression]) => graft.functions.WinnowFps(es.head,
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])),
    "sorted_intersect_size" ->
      ((es: Seq[Expression]) => graft.functions.SortedIntersectSize(es.head, es(1))),
    "vector_dot" ->
      ((es: Seq[Expression]) => graft.functions.DotProduct(es.head, es(1))),
    "vector_dot_int8" ->
      ((es: Seq[Expression]) => graft.functions.DotProductInt8(es.head, es(1))),
    "sig_agree_count" ->
      ((es: Seq[Expression]) => graft.functions.SigAgreeCount(es.head, es(1))),
    "hyperplane_sig" ->
      ((es: Seq[Expression]) => graft.functions.HyperplaneSig(es.head,
        es(1).eval().asInstanceOf[Int],
        es(2).eval() match { case i: Int => i.toLong; case l: Long => l })),
    "ngram_jaccard_sim" ->
      ((es: Seq[Expression]) => graft.functions.NGramJaccardSim(es.head, es(1),
        es(2).eval().asInstanceOf[Int])),
    "compression_ratio" ->
      ((es: Seq[Expression]) => graft.functions.CompressionRatio(es.head)),
    "cosine_sim" ->
      ((es: Seq[Expression]) => graft.functions.CosineSim(
        org.apache.spark.sql.catalyst.expressions.Cast(es.head,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.catalyst.expressions.Cast(es(1),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))),
    "feature_hash_embed" ->
      ((es: Seq[Expression]) => graft.functions.FeatureHashEmbed(es.head,
        es(1).eval().asInstanceOf[Int])),
  )
}
