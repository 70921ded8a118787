package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Sum of the weights of the elements of an `array<long>` digest
  * column that appear in a FIXED weighted reference set — the lookup
  * kernel behind map-side Naive-Bayes scoring: the classifier's
  * `(token-digest, llr)` dictionary rides along as two referenced
  * primitive arrays (`ctx.addReferenceObj`, the broadcast-model
  * pattern of [[CountInSortedLongs]] / the PQ codebooks), so scoring
  * a document is a pure per-row computation — no explode, no join,
  * no shuffle, streaming-legal in any output mode.
  *
  * `keys` MUST be sorted ascending with `weights` parallel to it
  * ([[graft.operators.Classifier.collectDict]] produces the pair).
  * Digests absent from `keys` contribute 0 (the ignore-unseen NB
  * convention). Duplicate digests in the INPUT array each contribute
  * (multinomial semantics — a token counts every time it occurs).
  * The generated code never assigns `ev.isNull` (the Janino
  * constant-assignment trap — see [[CountInSortedLongs]]).
  */
case class SumWeightsByHash(
    child: Expression, keys: Array[Long], weights: Array[Double])
    extends UnaryExpression {

  require(keys.length == weights.length,
    s"keys/weights length mismatch: ${keys.length} vs ${weights.length}")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sum_weights_by_hash"

  override def nullSafeEval(input: Any): Any =
    SumWeightsByHash.compute(input.asInstanceOf[ArrayData], keys, weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("dictKeys", keys, "long[]")
    val w = ctx.addReferenceObj("dictWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SumWeightsByHash.compute($c, $k, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): SumWeightsByHash =
    copy(child = newChild)
}

object SumWeightsByHash {
  def compute(arr: ArrayData, keys: Array[Long], weights: Array[Double]): Double = {
    val m = arr.numElements()
    var i = 0
    var s = 0.0
    while (i < m) {
      val idx = java.util.Arrays.binarySearch(keys, arr.getLong(i))
      if (idx >= 0) s += weights(idx)
      i += 1
    }
    s
  }
}
