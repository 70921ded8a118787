package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val left = Seq(
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 30L, "l3"),
    ("b", 15L, "l4"), ("c", 5L, "l5"))
    .toDF("k", "ts", "lval")
  private val right = Seq(
    ("a", 10L, 1.0), ("a", 25L, 2.0),
    ("b", 10L, 3.0), ("b", 16L, 4.0))
    .toDF("k", "ts", "rval")

  test("inclusive as-of: latest right row with ts <= left ts, per key; left join semantics") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("rval"))
      .select("lval", "asof_rval").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out === Map(
      "l1" -> Some(1.0), // same-instant right row matches (inclusive)
      "l2" -> Some(1.0), // 25 > 20, so still the ts=10 row
      "l3" -> Some(2.0),
      "l4" -> Some(3.0), // 16 > 15
      "l5" -> None))     // key with no right rows at all
  }

  test("strict as-of excludes the same-instant right row") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("rval"), inclusive = false)
      .select("lval", "asof_rval").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("l1") === None, "ts=10 right row must NOT match ts=10 left row strictly")
    assert(out("l4") === Some(3.0))
  }

  test("as-of join output keeps every left row exactly once and all left columns") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("rval"))
    assert(out.count() === left.count())
    assert(out.columns.toSeq === Seq("k", "ts", "lval", "asof_rval"))
  }

  test("plan: one hash shuffle on the key, no join operator at all") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("rval"))
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(plan).length
    assert(exchanges === 1, s"one key shuffle expected:\n$plan")
  }
}
