package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // pathologically skewed: one key owns 90% of the rows
  private lazy val skewed = (
    (1 to 900).map(i => (1L, s"payload_$i")) ++
    (1 to 100).map(i => ((i % 10 + 2).toLong, s"p_$i"))
  ).toDF("k", "payload")

  private lazy val dim =
    (1L to 12L).map(k => (k, s"dim_$k")).toDF("k", "name")

  test("keySkewReport flags the hot key") {
    val r = Skew.keySkewReport(skewed, col("k")).collect().head
    assert(r.getAs[Long]("n_rows") == 1000L)
    assert(r.getAs[Long]("n_keys") == 11L)
    assert(r.getAs[Long]("max_key_rows") == 900L)
    assert(r.getAs[Double]("skew_ratio") > 8.0)
  }

  test("heavyHitters returns the hot key first with its share") {
    val top = Skew.heavyHitters(skewed, col("k"), 3).collect()
    assert(top.head.getAs[Long]("key") == 1L)
    assert(top.head.getAs[Long]("key_rows") == 900L)
    assert(math.abs(top.head.getAs[Double]("share_pct") - 90.0) < 1e-9)
    assert(top.length == 3)
  }

  test("saltedJoin is bit-identical to the plain join (inner)") {
    val plain = skewed.join(dim, Seq("k")).orderBy("k", "payload")
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), saltFactor = 4)
      .orderBy("k", "payload")
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("saltedJoin left join keeps unmatched left rows exactly once") {
    val sparse = Seq((1L, "a"), (99L, "no_dim_row")).toDF("k", "payload")
    val got = Skew.saltedJoin(sparse, dim, Seq("k"), saltFactor = 4, "left")
      .orderBy("k").collect()
    assert(got.length == 2)
    assert(got(1).getAs[Long]("k") == 99L && got(1).isNullAt(2))
  }

  test("saltedJoin actually spreads the hot key across salt buckets") {
    val leftCols = skewed.columns.map(col).toSeq
    val salts = skewed.filter(col("k") === 1L)
      .select(pmod(xxhash64(leftCols: _*), lit(4)).as("salt"))
      .distinct().count()
    assert(salts == 4L, "hot key rows must hit every salt bucket")
  }

  test("saltedJoin rejects right/full joins") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, Seq("k"), 4, "full_outer")
    }
  }
}
