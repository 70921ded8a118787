package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §6.2.2.2 percent-encoding normalization as a native
  * Catalyst expression: `%XX` escapes of UNRESERVED octets
  * (ALPHA / DIGIT / `-` `.` `_` `~`) are decoded to the literal
  * character, every other escape's hex digits are uppercased, and
  * malformed escapes (`%` not followed by two hex digits) pass
  * through untouched. Decoding only unreserved octets can never
  * create a delimiter, so the transform is safe to apply to a whole
  * URI before parsing — which is how [[web.canonical_url]] uses it.
  *
  * Neither Spark natives nor RE2 can express per-match hex decoding,
  * hence the custom expression (the engine's preference order:
  * native expression over UDF). Codegen is one static-method call so
  * the generated code stays tiny inside whole-stage codegen; the
  * no-escape fast path (no `%` in the string) returns the input
  * UTF8String without allocating.
  */
case class PercentNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "percent_normalize"

  override def nullSafeEval(input: Any): Any =
    PercentNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PercentNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): PercentNormalize =
    copy(child = newChild)
}

object PercentNormalize {

  private def hexVal(b: Byte): Int = b match {
    case d if d >= '0' && d <= '9' => d - '0'
    case l if l >= 'a' && l <= 'f' => l - 'a' + 10
    case u if u >= 'A' && u <= 'F' => u - 'A' + 10
    case _ => -1
  }

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') ||
      v == '-' || v == '.' || v == '_' || v == '~'

  private def upHex(b: Byte): Byte =
    if (b >= 'a' && b <= 'f') (b - 32).toByte else b

  /** Static kernel (called from generated code — keep the signature
    * stable). Percent escapes are pure ASCII, so the scan works on
    * raw UTF-8 bytes; multi-byte sequences copy through untouched. */
  def normalize(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val n = in.length
    var i = 0
    var probe = true
    while (probe && i < n) { if (in(i) == '%') probe = false else i += 1 }
    if (probe) return s // fast path: no escapes at all
    val out = new Array[Byte](n) // output never grows (decode shrinks)
    var o = 0
    var changed = false
    i = 0
    while (i < n) {
      val c = in(i)
      if (c == '%' && i + 2 < n &&
          hexVal(in(i + 1)) >= 0 && hexVal(in(i + 2)) >= 0) {
        val v = (hexVal(in(i + 1)) << 4) | hexVal(in(i + 2))
        if (isUnreserved(v)) {
          out(o) = v.toByte; o += 1
          changed = true
        } else {
          val h1 = upHex(in(i + 1)); val h2 = upHex(in(i + 2))
          changed = changed || h1 != in(i + 1) || h2 != in(i + 2)
          out(o) = '%'; out(o + 1) = h1; out(o + 2) = h2; o += 3
        }
        i += 3
      } else {
        out(o) = c; o += 1; i += 1
      }
    }
    if (!changed) s else UTF8String.fromBytes(out, 0, o)
  }
}
