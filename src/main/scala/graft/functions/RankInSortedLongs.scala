package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** How many elements of a FIXED ascending-sorted `long[]` are `<=` a
  * `long` column value — i.e. the value's bucket index among the
  * sorted boundaries (upper-bound binary search). This is the range
  * -partitioner lookup behind [[graft.operators.Split.assignShards]]:
  * the quantile boundaries ride along as a referenced object
  * (`ctx.addReferenceObj`, same pattern as [[CountInSortedLongs]]),
  * so bucket assignment is a pure map-side O(log B) probe — no join,
  * no per-row array scan.
  *
  * The reference array MUST be sorted ascending (caller-enforced).
  * The generated code never assigns `ev.isNull` (see
  * [[SortedIntersectSize]] — assigning it with non-nullable children
  * fails Janino and silently demotes the task to interpreted eval).
  */
case class RankInSortedLongs(child: Expression, ref: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rank_in_sorted_longs"

  override def nullSafeEval(input: Any): Any =
    RankInSortedLongs.compute(input.asInstanceOf[Long], ref)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("sortedBounds", ref, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RankInSortedLongs.compute($c, $r);")
  }

  override protected def withNewChildInternal(newChild: Expression): RankInSortedLongs =
    copy(child = newChild)
}

object RankInSortedLongs {
  /** Count of `ref` elements <= `v`: the insertion point after any
    * run of equal elements. */
  def compute(v: Long, ref: Array[Long]): Int = {
    var lo = 0
    var hi = ref.length // invariant: ref(<lo) <= v < ref(>=hi)
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ref(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }
}
