package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two `array<double>` columns as a native Catalyst
  * expression with codegen.
  *
  * Semantics are EXACTLY `aggregate(zip_with(a, b, _*_), 0.0d, _+_)`:
  * a left-to-right fold (acc starts at 0.0, `acc += a(i)*b(i)` in index
  * order), null if the lengths differ or any element is null — so
  * swapping it in cannot change a single bit of any oracle-checked
  * similarity result. The win is evaluation: Spark's higher-order
  * functions are interpreted (lambda dispatch per element); a
  * 2M-candidate-pair similarity join over 64-dim vectors pays that
  * interpreter tax ~400M times. This compiles to a tight Java loop
  * inside whole-stage codegen.
  *
  * Reference analog: the Faiss inner-product search kernel
  * (/root/reference/pipeline/alignment/aligner.py:15-52) — the hot
  * scalar kernel of every similarity operator here.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_dot"

  /** Always nullable: the result is null on length mismatch or a null
    * element even when both INPUT columns are non-nullable. Without
    * this override Spark materializes `ev.isNull` as an unassignable
    * constant for non-nullable children, the generated `isNull = true`
    * fails Janino compilation, and every task silently falls back to
    * interpreted eval (~100× slower). */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getDouble(i) * y.getDouble(i)
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
         |  double $sum = 0.0d;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
