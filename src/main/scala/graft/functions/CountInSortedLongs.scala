package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** How many elements of an `array<long>` column appear in a FIXED
  * ascending-sorted `long[]` reference set (binary search per
  * element) — the membership kernel behind the stateless streaming
  * decontamination gate: the eval set's gram digests ride along as a
  * referenced object (`ctx.addReferenceObj`, the same broadcast-model
  * pattern as the PQ codebooks), so the test is a pure map-side
  * filter — no join, no state, streaming-legal in any output mode.
  *
  * The reference array MUST be sorted ascending (caller-enforced;
  * [[graft.streaming.StreamOps.evalGramDigests]] produces it). The
  * generated code never assigns `ev.isNull` (see
  * [[SortedIntersectSize]] — assigning it with non-nullable children
  * fails Janino and silently demotes the task to interpreted eval).
  */
case class CountInSortedLongs(child: Expression, ref: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "count_in_sorted_longs"

  override def nullSafeEval(input: Any): Any =
    CountInSortedLongs.compute(input.asInstanceOf[ArrayData], ref)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("sortedLongs", ref, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CountInSortedLongs.compute($c, $r);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSortedLongs =
    copy(child = newChild)
}

object CountInSortedLongs {
  def compute(arr: ArrayData, ref: Array[Long]): Int = {
    val m = arr.numElements()
    var i = 0
    var n = 0
    while (i < m) {
      if (java.util.Arrays.binarySearch(ref, arr.getLong(i)) >= 0) n += 1
      i += 1
    }
    n
  }
}
