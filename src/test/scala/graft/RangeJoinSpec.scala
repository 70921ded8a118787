package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pointInInterval equals the brute-force BETWEEN join, including boundaries") {
    val rnd = new scala.util.Random(42)
    val points = Seq.tabulate(300)(i => (i.toLong, rnd.nextDouble() * 1000 - 200))
      .toDF("pid", "p")
    val intervals = Seq.tabulate(60) { i =>
      val lo = rnd.nextDouble() * 900 - 200
      (i.toLong, lo, lo + rnd.nextDouble() * 120)
    }.toDF("iid", "lo", "hi")
    for (w <- Seq(7.3, 50.0, 1000.0)) {
      val bucketed = RangeJoin.pointInInterval(points, col("p"), intervals,
          col("lo"), col("hi"), bucketWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val brute = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(bucketed === brute, s"bucketWidth=$w")
    }
    // exact boundary points are included on both ends
    val bPts = Seq((1L, 10.0), (2L, 20.0), (3L, 9.999), (4L, 20.001)).toDF("pid", "p")
    val bItv = Seq((1L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val hits = RangeJoin.pointInInterval(bPts, col("p"), bItv, col("lo"), col("hi"), 4.0)
      .select("pid").as[Long].collect().toSet
    assert(hits === Set(1L, 2L))
  }

  test("NULLs and empty intervals match nothing; pairs surface exactly once") {
    val points = Seq((1L, Some(5.0)), (2L, None)).toDF("pid", "p")
    val intervals = Seq(
      (1L, Some(0.0), Some(10.0)),  // contains p=5
      (2L, Some(8.0), Some(2.0)),   // lo > hi: empty interval
      (3L, None, Some(10.0))        // null bound
    ).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, col("p"), intervals,
        col("lo"), col("hi"), bucketWidth = 1.0) // interval spans many buckets
      .select("pid", "iid").as[(Long, Long)].collect().toList
    assert(out === List((1L, 1L)), s"got $out") // exactly once, despite 13 bucket cells
  }

  test("the plan is a hash join on the bucket id — no nested loop") {
    val plan = SparkEntry.queries("q76_range_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"range join must not nested-loop:\n$plan")
    assert(plan.contains("__bkt"), s"bucket key missing from the join:\n$plan")
  }
}
