package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val widthConf = "spark.graft.range_join.bucket_width"

  private def points: DataFrame = {
    val rnd = new scala.util.Random(7)
    Seq.tabulate(200)(i => (i.toLong, rnd.nextDouble() * 400 - 50)).toDF("pid", "p")
  }
  private def intervals: DataFrame = {
    val rnd = new scala.util.Random(11)
    Seq.tabulate(40) { i =>
      val lo = rnd.nextDouble() * 350 - 50
      (i.toLong, lo, lo + rnd.nextDouble() * 60)
    }.toDF("iid", "lo", "hi")
  }

  private def withRule[A](f: => A): A = {
    GraftSession.installOptimizerRules(spark)
    spark.conf.set(widthConf, "20.0")
    try f
    finally {
      spark.conf.unset(widthConf)
      // strip EVERY graft rule — see JaccardRewriteSpec.withRule
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.getClass.getName.startsWith("graft.plans."))
    }
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("BETWEEN theta-join rewrites to the bucket join: same rows, no nested loop") {
    val q = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
    val naive = pairsOf(q) // width unset: rule inert, nested loop evaluates
    assert(q.queryExecution.executedPlan.toString.contains("NestedLoopJoin"),
      "precondition: without the rule this must be a nested loop")
    withRule {
      val rewritten = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      assert(pairsOf(rewritten) === naive)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
        s"rule must eliminate the nested loop:\n$plan")
      assert(plan.contains("__bkt"), s"bucket key missing:\n$plan")
    }
  }

  test("strict bounds, swapped sides, and residual conjuncts are preserved") {
    val strictNaive = pairsOf(points.join(intervals,
      col("p") > col("lo") && col("p") < col("hi") && col("iid") % 2 === 0))
    withRule {
      // point side on the RIGHT of the join, bound comparisons reversed
      val rewritten = intervals.join(points,
        col("lo") < col("p") && col("hi") > col("p") && col("iid") % 2 === 0)
      assert(pairsOf(rewritten) === strictNaive)
      assert(!rewritten.queryExecution.executedPlan.toString.contains("NestedLoop"))
    }
  }

  test("joins with an equi conjunct are left alone (already hash-joinable)") {
    val pts = points.withColumn("k", col("pid") % 4)
    val itv = intervals.withColumn("k2", col("iid") % 4)
    val naive = pairsOf(pts.join(itv,
      col("k") === col("k2") && col("p") >= col("lo") && col("p") <= col("hi")))
    withRule {
      val q = pts.join(itv,
        col("k") === col("k2") && col("p") >= col("lo") && col("p") <= col("hi"))
      assert(pairsOf(q) === naive)
      assert(!q.queryExecution.executedPlan.toString.contains("__bkt"),
        "equi+range joins must not be rewritten")
    }
  }

  test("self-derived sides: correct rows whether the rewrite fires or bails out") {
    // both join inputs derive from the same frame — the analyzer's
    // self-join dedup can remap attribute ids, in which case the rule
    // must bail out gracefully (never corrupt the plan)
    val base = points
    val itv = base.select(col("pid").as("iid"), (col("p") - 5).as("lo"), (col("p") + 5).as("hi"))
    val naive = pairsOf(base.join(itv, col("p") >= col("lo") && col("p") <= col("hi")))
    withRule {
      val got = pairsOf(base.join(itv, col("p") >= col("lo") && col("p") <= col("hi")))
      assert(got === naive)
    }
  }

  test("boundary points included; empty and null intervals match nothing") {
    val pts = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None)).toDF("pid", "p")
    val itv = Seq((1L, Some(10.0), Some(20.0)), (2L, Some(30.0), Some(25.0)),
      (3L, None, Some(50.0))).toDF("iid", "lo", "hi")
    withRule {
      val got = pairsOf(pts.join(itv, col("p") >= col("lo") && col("p") <= col("hi")))
      assert(got === Set((1L, 1L), (2L, 1L)))
    }
  }
}
