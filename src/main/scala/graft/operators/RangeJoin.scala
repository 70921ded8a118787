package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested loop — the other
  * non-equi join Spark has no physical operator for (besides the
  * temporal [[AsOf]] case): `points ⋈ intervals ON p BETWEEN lo AND
  * hi` plans as BroadcastNestedLoopJoin, O(n·m) comparisons.
  *
  * Grid bucketing: pick a bucket width w; a point lives in exactly
  * one bucket `⌊p/w⌋`, an interval explodes to every bucket its span
  * overlaps — so bucket EQUALITY is a superset of containment, the
  * join is an ordinary hash join, and the exact `lo ≤ p ≤ hi` verify
  * on collisions makes the output identical to the nested loop on any
  * input. Each qualifying pair surfaces exactly once (a point has ONE
  * bucket), so no distinct pass is needed.
  *
  * The interval's bucket range is widened by ±1 bucket: containment
  * guarantees `⌊p/w⌋ ∈ [⌊lo/w⌋, ⌊hi/w⌋]` in exact arithmetic, but the
  * divisions here are floating-point and a boundary point could round
  * across an integer differently than its bound — one extra bucket per
  * side makes correctness independent of rounding for the cost of two
  * empty-ish candidate cells.
  *
  * Scale shape: one narrow map per side (bucket assignment; intervals
  * fan out `span/w + 3` rows), one hash-partitioned equi-join on the
  * bucket id, verify at collision time. Cost = Σ_bucket |points| ×
  * |intervals| per bucket — pick w near the median interval span so
  * fan-out and bucket occupancy stay balanced; a hot value range is
  * an AQE-splittable skewed bucket, not a plan change. NULL points or
  * bounds produce NULL bucket ids and drop out of the inner equi-join,
  * matching BETWEEN's never-true-on-NULL semantics.
  */
object RangeJoin {

  /** All (point row × interval row) combinations with
    * `lo ≤ p ≤ hi` — column sets of the two frames pass through
    * unchanged (keep names disjoint or frame-qualify downstream).
    * `point` must resolve against `points`; `lo`/`hi` against
    * `intervals`; all three numeric. */
  def pointInInterval(
      points: DataFrame, point: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val pts = points.withColumn("__bkt", floor(point / w).cast("long"))
    val itv = intervals
      .filter(lo <= hi) // empty intervals match nothing; skip their fan-out
      .withColumn("__bkt", explode(sequence(
        floor(lo / w).cast("long") - 1,
        floor(hi / w).cast("long") + 1)))
    pts.join(itv, Seq("__bkt"))
      .filter(point >= lo && point <= hi)
      .drop("__bkt")
  }
}
