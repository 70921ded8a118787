package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CorpusIO

/** Bucketed co-located joins: writing both sides bucketed on the join
  * key must make the join shuffle-free — the layout strategy for
  * repeatedly-joined 100 TB fact tables. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("join between same-bucketed tables plans no shuffle Exchange") {
    val dir = "/root/testdata/sf0.001"
    CorpusIO.writeBucketed(
      Tables.lineitem(spark, dir), "li_bucketed", Seq("l_orderkey"), 8)
    CorpusIO.writeBucketed(
      Tables.orders(spark, dir), "ord_bucketed", Seq("o_orderkey"), 8)

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("qty"))

    // disable broadcast so the join strategy itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not re-shuffle the fact side:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not re-shuffle the orders side:\n$plan")
      assert(joined.collect().length > 0, "join must still produce rows")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
