package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-offset spans of each word in the ORIGINAL string —
  * `(start << 32) | end` packed longs, one per word, in order. `start`
  * is the 0-based code-point offset of the word's first character,
  * `end` the offset one past its last, so
  * `substr(text, start + 1, end − start)` (Spark's 1-based, code-point
  * `Substring`) recovers the word with its original casing.
  *
  * Word boundaries are IDENTICAL to [[WordNGrams]] (maximal runs of
  * non-ASCII-whitespace bytes; tab/LF/VT/FF/CR/space, all single-byte
  * in UTF-8) — so word k here is word k of `word_ngrams(text, 1)`, and
  * positional decisions made on the normalized stream can be mapped
  * back to original-byte cut ranges ([[graft.operators.Dedup
  * .removeDuplicateSpansRaw]], the ExactSubstr rewrite that preserves
  * original casing/spacing outside cut spans). Unlike [[WordNGrams]]
  * the input is NOT trimmed or lowercased: offsets index the string as
  * stored. Code points are counted by UTF-8 lead bytes, matching
  * `UTF8String` substring semantics (supplementary characters are one
  * code point).
  */
case class WordCharSpans(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_char_spans"

  override def nullSafeEval(input: Any): Any =
    WordCharSpans.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordCharSpans.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WordCharSpans =
    copy(child = newChild)
}

object WordCharSpans {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    var words = 0
    var i = 0
    while (i < nb) { // count first to size the array exactly
      while (i < nb && isWs(bytes(i))) i += 1
      if (i < nb) { words += 1; while (i < nb && !isWs(bytes(i))) i += 1 }
    }
    val out = new Array[Long](words)
    var w = 0
    var ch = 0 // code points consumed so far = current char offset
    i = 0
    while (i < nb) {
      while (i < nb && isWs(bytes(i))) { i += 1; ch += 1 } // ws is 1-byte/1-char
      if (i < nb) {
        val cs = ch
        while (i < nb && !isWs(bytes(i))) {
          if ((bytes(i) & 0xc0) != 0x80) ch += 1 // lead byte = new code point
          i += 1
        }
        out(w) = (cs.toLong << 32) | ch
        w += 1
      }
    }
    new GenericArrayData(out)
  }
}
