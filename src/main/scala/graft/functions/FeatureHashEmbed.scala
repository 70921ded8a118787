package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** L2-normalized feature-hashed bag-of-words embedding of a token
  * array, as a native codegen expression — the "hashing trick"
  * (Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
  * Learning"): every token is hashed to one of `dim` buckets with a
  * ±1 sign hash, occurrences accumulate, the vector is L2-normalized.
  *
  * This closes the reference's embedding-GENERATION gap: its aligner
  * encodes with LaBSE (reference pipeline/alignment/segmentation
  * sibling, pipeline/alignment/aligner.py:19-24), which is model
  * inference — out of engine scope. What the engine CAN own is a
  * deterministic, training-free text→vector map good enough to drive
  * the whole downstream vector surface (kNN join, semantic dedup,
  * IVF/LSH/PQ) end-to-end from raw text, with no user-supplied model.
  * Hashed BoW is the standard such map (Vowpal Wabbit's default input
  * encoding; spark.ml `HashingTF` is the unsigned variant).
  *
  * Hash choice: two code-point Horner chains mod the prime 1000003
  * (multipliers 31 and 131) rather than murmur, so the DuckDB oracle
  * can replay the exact hash with a recursive CTE over
  * `unicode(substr(w, i, 1))` — Spark's murmur variants have no
  * DuckDB twin (see [[HashingTfIndices]] on the two diverging murmur
  * tails). Iteration is by Unicode CODE POINT, not UTF-16 char,
  * matching DuckDB's character-indexed `substr`/`unicode`.
  *
  * Float identity with the oracle: bucket accumulators are exact
  * integers, the norm is one `sqrt` of an exact integer sum, and each
  * output element is one IEEE division — every step is correctly
  * rounded in both engines, so values match bit-for-bit (same
  * reasoning as the q20 `list_dot_product` oracles).
  *
  * Null AND empty-string tokens are skipped — empties in the kernel
  * rather than an `array_filter` upstream, because higher-order
  * functions don't code-generate and would knock the whole projection
  * out of whole-stage codegen (EmbedSpec pins the stage). An all-null/
  * all-empty array yields the zero vector (callers that must
  * distinguish "no tokens" should test the input, not the output).
  * Null INPUT yields null (`nullIntolerant`).
  */
case class FeatureHashEmbed(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim > 0, "dim must be positive")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "feature_hash_embed"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    FeatureHashEmbed.compute(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FeatureHashEmbed.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): FeatureHashEmbed =
    copy(child = newChild)
}

object FeatureHashEmbed {
  /** Modulus for both Horner chains — prime, small enough that
    * `h * 131 + maxCodePoint` never overflows a long. */
  val Mod: Long = 1000003L

  /** Static helper shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, dim: Int): ArrayData = {
    val acc = new Array[Long](dim)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i).toString
        if (s.nonEmpty) {
          var h1 = 0L
          var h2 = 0L
          var j = 0
          while (j < s.length) {
            val cp = s.codePointAt(j)
            h1 = (h1 * 31 + cp) % Mod
            h2 = (h2 * 131 + cp) % Mod
            j += Character.charCount(cp)
          }
          acc((h1 % dim).toInt) += (if (h2 % 2 == 0) 1L else -1L)
        }
      }
      i += 1
    }
    var ss = 0.0
    var k = 0
    while (k < dim) { ss += acc(k).toDouble * acc(k).toDouble; k += 1 }
    val out = new Array[Double](dim)
    if (ss > 0) {
      val nrm = math.sqrt(ss)
      k = 0
      while (k < dim) { out(k) = acc(k).toDouble / nrm; k += 1 }
    }
    new GenericArrayData(out)
  }
}
