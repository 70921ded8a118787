package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Integer dot product of two `array<tinyint>` int8-quantized vectors
  * as a native Catalyst expression with codegen.
  *
  * The scan-side kernel of the quantized similarity path
  * ([[graft.operators.Similarity.quantizedTopK]]): at 100 TB the
  * embedding corpus is stored int8 ([[graft.operators.Similarity.quantizeInt8]],
  * 4× smaller than fp32), and the first-pass search never dequantizes —
  * `cos ≈ dot8(a,b) / (√dot8(a,a)·√dot8(b,b))` (the per-vector scales
  * cancel), all from byte reads at a quarter of the memory bandwidth.
  * Exact integer arithmetic: |q| ≤ 127 ⇒ each term ≤ 16129, safe in
  * int32 up to ~133k dims.
  *
  * Null on length mismatch or null element (same contract as
  * [[DotProduct]]).
  */
case class DotProductInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_dot_int8"

  /** Nullable for the mismatch case — see DotProduct for the Janino
    * constraint on assigning `ev.isNull` with non-nullable children. */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getByte(i) * y.getByte(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $sum = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += $a.getByte($i) * $b.getByte($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductInt8 =
    copy(left = newLeft, right = newRight)
}
