package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact cosine similarity of two `array<double>` vectors — the MARKER
  * expression of the cosine-join rewrite (the vector analog of
  * [[NGramJaccardSim]]).
  *
  * Arithmetic is EXACTLY [[graft.operators.Similarity.cosine]]'s:
  * left-to-right dot folds, `dot / (√(a·a) · √(b·b))`, 0.0 when either
  * norm is zero, null on length mismatch — so a threshold decision
  * agrees bit-for-bit between evaluating the marker per pair and the
  * cell-pruned rewrite's verify. In a projection it evaluates per row;
  * in a join predicate `cosine_sim(a.v, b.v) >= t` the only plan Spark
  * itself has is a nested-loop cross product — the shape
  * [[graft.plans.CosineJoinRewrite]] pattern-matches and replaces.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"
  override def nullable: Boolean = true // null on length mismatch

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ctx.freshName("cos")
      s"""
         |Double $v = graft.functions.CosineSim.compute($a, $b);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Boxed so length-mismatch can signal null (mirrors DotProduct). */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val sna = math.sqrt(na)
    val snb = math.sqrt(nb)
    if (sna == 0 || snb == 0) 0.0d else dot / (sna * snb)
  }
}
