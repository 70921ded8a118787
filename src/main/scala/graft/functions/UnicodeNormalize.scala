package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression.
  *
  * The reference's single most important scalar op is NFC
  * normalization (macron preservation for Náhuatl text):
  * `/root/reference/pipeline/processing/cleaning.py:4-8` and
  * `/root/reference/src/transforms/normalizers.py:94-97`. Spark has no
  * builtin for it, so this is a custom `UnaryExpression` with
  * `doGenCode` so it stays inside whole-stage codegen (no UDF
  * serialization, no codegen fence).
  *
  * ASCII fast path: `Normalizer.isNormalized` on ASCII-only strings is
  * O(n) with no allocation; the expensive `Normalizer.normalize` only
  * runs on strings that actually need it. At 100 TB most text is
  * already NFC, so the fast path dominates.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, form)) input
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formName = form.name()
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      s"""
         |String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str,
         |    java.text.Normalizer.Form.$formName)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($str,
         |      java.text.Normalizer.Form.$formName));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
