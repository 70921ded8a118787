package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-grams of a string, returned SORTED ascending in
  * UTF8 binary order — the exact shape [[SortedIntersectSize]] and the
  * prefix-filter pipeline consume — as a native expression.
  *
  * Equivalent Column formulation (`array_distinct(filter(transform(
  * sequence(...), substr...)))` + `sort_array`) is semantically fine
  * but generates several KB of Janino source PER USE SITE: the fused
  * expression tree blows past HotSpot's huge-method JIT threshold, so
  * first executions run interpreted (~100× slower until/unless C2
  * catches up), and Janino compilation itself costs seconds per plan.
  * This expression's generated code is ONE static call; the loop below
  * is ordinary library bytecode, JIT-compiled once per JVM.
  *
  * Indices are code points (matches `substr`/DuckDB slicing on
  * non-ASCII text). Strings shorter than n yield an empty array — or
  * the singleton {""} with `sentinel = true` (the set-similarity
  * pipeline's representation of the empty set: "" can never collide
  * with a real n-gram, and J(∅,∅)=1 / J(∅,S)=0 fall out of plain set
  * arithmetic, evaluated once instead of via a CASE WHEN that would
  * compute the gram set twice).
  */
case class CharNGrams(child: Expression, n: Int, sentinel: Boolean = false)
    extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNGrams.compute(input.asInstanceOf[UTF8String], n, sentinel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNGrams.compute($c, $n, $sentinel);")

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {
  private val binaryOrder = new java.util.Comparator[UTF8String] {
    // binaryCompare, NOT compareTo: compareTo runs an isTesting()
    // env-var probe per call in Spark 4 (see SortedIntersectSize).
    override def compare(a: UTF8String, b: UTF8String): Int = a.binaryCompare(b)
  }

  /** Distinct, binary-sorted n-grams; empty (or sentinel {""}) when
    * numChars < n. */
  def compute(s: UTF8String, n: Int, sentinel: Boolean): ArrayData = {
    val nc = s.numChars()
    if (nc < n) {
      return new GenericArrayData(
        if (sentinel) Array[Any](UTF8String.EMPTY_UTF8) else new Array[Any](0))
    }
    val set = new java.util.TreeSet[UTF8String](binaryOrder)
    var i = 0
    while (i + n <= nc) {
      set.add(s.substring(i, i + n))
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
