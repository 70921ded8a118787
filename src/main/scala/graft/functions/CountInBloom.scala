package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.util.sketch.BloomFilter

/** How many elements of an `array<long>` column MIGHT be members of a
  * FIXED Bloom filter — the membership kernel for decontamination
  * against an eval set too large to collect as a sorted digest array
  * ([[CountInSortedLongs]]'s scale sibling). A sorted `long[]` of n
  * digests costs 8n bytes on the driver and in every task broadcast;
  * the Bloom filter costs ~1.44·log2(1/fpp) BITS per digest (~3.6
  * bytes at fpp=1e-6) with a one-sided error: the count can only
  * OVER-estimate, so "count == 0 → provably clean" still holds and a
  * removal gate built on it only over-removes at the fpp rate, never
  * leaks contamination.
  *
  * The filter rides along as a referenced object (`ctx.addReferenceObj`
  * — serialized once per stage with the task binary, the same
  * broadcast model as the PQ codebooks), so the test is a pure
  * map-side expression: no join, no state, streaming-legal in any
  * output mode. Spark's `BloomFilter` hashes deterministically
  * (seeded Murmur3, no RNG), so output is reproducible run-to-run.
  *
  * The generated code never assigns `ev.isNull` (see
  * [[SortedIntersectSize]] — assigning it with non-nullable children
  * fails Janino and silently demotes the task to interpreted eval).
  */
case class CountInBloom(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "count_in_bloom"

  override def nullSafeEval(input: Any): Any =
    CountInBloom.compute(input.asInstanceOf[ArrayData], bloom)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CountInBloom.compute($c, $b);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInBloom =
    copy(child = newChild)
}

object CountInBloom {
  def compute(arr: ArrayData, bloom: BloomFilter): Int = {
    val m = arr.numElements()
    var i = 0
    var n = 0
    while (i < m) {
      if (bloom.mightContainLong(arr.getLong(i))) n += 1
      i += 1
    }
    n
  }
}
