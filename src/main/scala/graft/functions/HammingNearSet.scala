package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Is a 64-bit signature within `maxHamming` bits of ANY signature in
  * a FIXED reference set? The map-side kernel behind the media
  * blocklist gate ([[graft.streaming.StreamOps.hammingBlockGateStream]]):
  * the reference set rides along as per-band bucket-sorted arrays
  * (`ctx.addReferenceObj`, the [[CountInSortedLongs]] broadcast-model
  * pattern), probed with the same pigeonhole decomposition the
  * banded joins use — `maxHamming + 1` bands, a within-budget pair
  * must agree on at least one whole band, so per row the test is
  * (k+1) binary searches plus popcount verifies over the (few)
  * bucket collisions. EXACT — no false negatives, no false
  * positives, unlike the Bloom gates.
  *
  * `buckets(b)` must be ascending-sorted with `sigs(b)` aligned
  * (caller-enforced; [[graft.operators.Dedup.hammingIndex]] produces
  * the pair). Never assigns `ev.isNull` (the round-2 Janino rule). */
case class HammingNearSet(child: Expression, maxHamming: Int,
    buckets: Array[Array[Long]], sigs: Array[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming_near_set"

  override def nullSafeEval(input: Any): Any =
    HammingNearSet.near(input.asInstanceOf[Long], maxHamming, buckets, sigs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("hammingBuckets", buckets, "long[][]")
    val s = ctx.addReferenceObj("hammingSigs", sigs, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HammingNearSet.near($c, $maxHamming, $b, $s);")
  }

  override protected def withNewChildInternal(newChild: Expression): HammingNearSet =
    copy(child = newChild)
}

object HammingNearSet {
  def near(sig: Long, maxHamming: Int,
      buckets: Array[Array[Long]], sigs: Array[Array[Long]]): Boolean = {
    val nBands = maxHamming + 1
    var b = 0
    while (b < nBands) {
      val bucket = Bits.bandOf(sig, b, maxHamming)
      val arr = buckets(b)
      var i = java.util.Arrays.binarySearch(arr, bucket)
      if (i >= 0) {
        while (i > 0 && arr(i - 1) == bucket) i -= 1
        val sg = sigs(b)
        while (i < arr.length && arr(i) == bucket) {
          if (java.lang.Long.bitCount(sig ^ sg(i)) <= maxHamming) return true
          i += 1
        }
      }
      b += 1
    }
    false
  }
}
