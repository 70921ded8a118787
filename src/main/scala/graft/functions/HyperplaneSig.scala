package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH signature of an `array<double>` vector as a
  * native Catalyst expression with codegen: bit b of the result is set
  * iff `Σ_j vec(j) · sign_b(j) > 0`, where `sign_b(j) = ±1` is derived
  * from `byteswap64(seed ^ (b << 32) ^ j)` — the same model-free
  * pseudo-random hyperplanes as the Column formulation in
  * [[graft.operators.Similarity.hyperplaneSignature]], computable on
  * any executor with no broadcast state.
  *
  * Why native: the Column formulation materializes the hyperplanes in
  * the EXPRESSION TREE — `dim × bits` element_at/multiply nodes per
  * signature (≈ 1,500 nodes at dim=64/bits=12 — and ≈ 18,000 at
  * LaBSE's dim=768, where Catalyst analysis time and generated-code
  * size both blow past practical limits, exactly the huge-method JIT
  * cliff SKILL.md documents). Here the tree is ONE node regardless of
  * dimensionality; hyperplane signs are recomputed per element by a
  * 3-op hash — cheaper than reading a broadcast matrix at any dim.
  *
  * Bit-identical to the Column formulation: the inner sum accumulates
  * in index order (same left-to-right fold), `> 0` on the same double.
  * Null for a null array; null ELEMENTS contribute nothing (the Column
  * form's `element_at` + `+` chain would null the whole contribution —
  * callers feed non-null embedding elements, where both agree).
  */
case class HyperplaneSig(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(a: Any): Any =
    HyperplaneSig.compute(a.asInstanceOf[ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.HyperplaneSig.compute($a, $bits, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Static kernel shared by eval and generated code (one call site in
    * codegen keeps the generated method tiny at any dimensionality). */
  def compute(vec: ArrayData, bits: Int, seed: Long): Long = {
    val n = vec.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      val bSeed = seed ^ (b.toLong << 32)
      var contrib = 0.0d
      var j = 0
      while (j < n) {
        if (!vec.isNullAt(j)) {
          val sign = if (scala.util.hashing.byteswap64(bSeed ^ j) < 0) -1.0d else 1.0d
          contrib += vec.getDouble(j) * sign
        }
        j += 1
      }
      if (contrib > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
