package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** The DISTINCT nonzero feature indices spark.ml's `HashingTF` assigns
  * a token array — `indexOf` per term, deduplicated and sorted — as a
  * native codegen expression.
  *
  * Exists for the q19 oracle export: the exported index sets must be
  * exactly the model's feature sets, but extracting them from the
  * transformed vectors costs a numFeatures-wide dense explode per doc
  * (~16k rows/doc — measured 4× the whole query at sf0.1). ml's term
  * hash for strings is `Murmur3_x86_32.hashUnsafeBytes2(utf8, seed 42)`
  * (FeatureHasher.murmur3Hash — the SPARK_3 hashFuncVersion of
  * HashingTF.indexOf; note SQL `hash()` uses the OTHER tail-mixing
  * variant and diverges), then `nonNegativeMod(h, numFeatures)`.
  * DedupSpec pins this kernel against `HashingTF.indexOf` on real
  * corpus terms so an ml-side change can never silently skew the
  * oracle.
  */
case class HashingTfIndices(child: Expression, numFeatures: Int)
    extends UnaryExpression {
  require(numFeatures > 0, "numFeatures must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hashingtf_indices"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashingTfIndices.compute(input.asInstanceOf[ArrayData], numFeatures)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashingTfIndices.compute($c, $numFeatures)")

  override protected def withNewChildInternal(newChild: Expression): HashingTfIndices =
    copy(child = newChild)
}

object HashingTfIndices {
  def compute(tokens: ArrayData, numFeatures: Int): ArrayData = {
    val n = tokens.numElements()
    val seen = new java.util.TreeSet[Integer]()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = Murmur3_x86_32.hashUnsafeBytes2(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
        seen.add(((h % numFeatures) + numFeatures) % numFeatures)
      }
      i += 1
    }
    val out = new Array[Int](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
