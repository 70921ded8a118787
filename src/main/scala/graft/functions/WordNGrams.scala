package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a string — trim, lowercase, split on ASCII
  * whitespace runs, emit every n consecutive words joined by one
  * space, IN ORDER and WITH multiplicity (repetition profiling counts
  * occurrences; the distinct/sorted sibling for set similarity is
  * [[CharNGrams]]).
  *
  * Words are maximal non-whitespace runs — NEVER empty, unlike raw
  * `split(trim(c), "\\s+")`, whose Java-regex semantics emit a bogus
  * leading "" when the input starts with non-space whitespace
  * (Column `trim` strips 0x20 only). Bit-identical to the Column
  * formulation `transform(sequence(1, size(ws) − n + 1), i →
  * concat_ws(" ", slice(ws, i, n)))` over that split with the ""
  * artifacts filtered out (PropertySpec cross-validates); fewer than
  * n words yield an empty array. As with the other kernels, the HOF
  * chain is interpreted per gram and generates multi-KB Janino
  * sources per use site — this expression's generated code is ONE
  * static call.
  *
  * ASCII whitespace only (matches Java regex `\s` without
  * UNICODE_CHARACTER_CLASS): tab, LF, VT, FF, CR, space — all
  * single-byte in UTF-8, so the scan below is byte-safe.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Ordered, multiplicity-preserving word n-grams of
    * `lower(trim(s))`; empty/whitespace-only input has zero words and
    * yields an empty array at every n. */
  def compute(s0: UTF8String, n: Int): ArrayData = {
    val s = s0.trim().toLowerCase
    val nb = s.numBytes()
    if (nb == 0) return new GenericArrayData(new Array[Any](0))
    val bytes = s.getBytes
    // word spans over the trimmed bytes (no leading/trailing ws left)
    var words = 0
    var i = 0
    while (i < nb) { // count first to size the arrays exactly
      while (i < nb && isWs(bytes(i))) i += 1
      if (i < nb) { words += 1; while (i < nb && !isWs(bytes(i))) i += 1 }
    }
    if (words < n) return new GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](words)
    val ends = new Array[Int](words)
    var w = 0
    i = 0
    while (i < nb) {
      while (i < nb && isWs(bytes(i))) i += 1
      if (i < nb) {
        starts(w) = i
        while (i < nb && !isWs(bytes(i))) i += 1
        ends(w) = i
        w += 1
      }
    }
    val out = new Array[Any](words - n + 1)
    var g = 0
    while (g <= words - n) {
      // join words g..g+n-1 with single spaces
      var len = n - 1
      var k = g
      while (k < g + n) { len += ends(k) - starts(k); k += 1 }
      val buf = new Array[Byte](len)
      var pos = 0
      k = g
      while (k < g + n) {
        val wl = ends(k) - starts(k)
        System.arraycopy(bytes, starts(k), buf, pos, wl)
        pos += wl
        if (k < g + n - 1) { buf(pos) = 0x20; pos += 1 }
        k += 1
      }
      out(g) = UTF8String.fromBytes(buf)
      g += 1
    }
    new GenericArrayData(out)
  }
}
