package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Winnow

/** Winnowing fingerprints: the frame-bounded window-min predicate vs a
  * literal rightmost-min-per-window reference, ties included (a 2-word
  * vocabulary makes gram hashes collide constantly), plus the overlap
  * guarantee and the plan shape. */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference: canonical winnowing per the paper — every window of w
    * gram hashes selects its RIGHTMOST minimum; selections dedupe. */
  private def winnowRef(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val words = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val grams = words.sliding(k).filter(_.length == k).map(_.mkString(" ")).toArray
    val hs = grams.map { g =>
      val hex = MessageDigest.getInstance("MD5").digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    (0 to hs.length - w).flatMap { j =>
      val m = hs.slice(j, j + w).min
      val p = (j until j + w).filter(hs(_) == m).max
      Some((p + 1, hs(p)))
    }.toSet
  }

  test("fingerprints == canonical rightmost-min winnowing, with heavy ties") {
    val rnd = new scala.util.Random(7)
    // 2-word vocabulary → repeated grams → equal hashes → tie-breaks
    // exercised; lengths straddle the no-complete-window boundary
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(14) // 0..13 words; k+w-1 = 7
      (i.toLong, (0 until n).map(_ => if (rnd.nextBoolean()) "aa" else "bb")
        .mkString(" "))
    }.toDF("doc_id", "text")
    val got = Winnow.fingerprints(docs, "doc_id", col("text"), k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = docs.collect().flatMap { r =>
      winnowRef(r.getString(1), 3, 4).map { case (p, h) => (r.getLong(0), p, h) }
    }.toSet
    assert(got === want)
  }

  test("guarantee: docs sharing a run of >= k+w-1 words share a fingerprint") {
    val shared = "uno dos tres cuatro cinco seis siete" // 7 = k+w-1 at k=w=4
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"xx yy zz $shared ww"),
      (3L, "totally different words here with no overlap at all ok")
    ).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", col("text"), k = 4, w = 4)
    val a = fps.filter(col("doc_id") === 1).select("fp").as[Long].collect().toSet
    val b = fps.filter(col("doc_id") === 2).select("fp").as[Long].collect().toSet
    val c = fps.filter(col("doc_id") === 3).select("fp").as[Long].collect().toSet
    assert((a intersect b).nonEmpty, "shared 7-word run must share a fingerprint")
    assert((a intersect c).isEmpty && (b intersect c).isEmpty)
  }

  test("overlapPairs finds the planted pair and the df cap drops boilerplate") {
    val boiler = "copyright footer terms apply all rights reserved forever"
    val pairText = "the quick brown fox jumps over the lazy dog again today"
    val docs = ((0 until 40).map(i => (i.toLong, s"$boiler filler$i")) ++
      Seq((100L, pairText), (101L, pairText))).toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(docs, "doc_id", col("text"),
      k = 4, w = 4, minShared = 2, maxDf = 8).collect()
    // the 40-doc boilerplate fps exceed maxDf=8 → no pairs among 0..39;
    // the planted twins share every fingerprint
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((100L, 101L)))
  }

  test("native WinnowFps kernel == window-function fingerprints, ties and fixture") {
    // tie-heavy fuzz fixture (2-word vocab) + the real sf docs
    val rnd = new scala.util.Random(11)
    val fuzz = (0 until 40).map { i =>
      (i.toLong, (0 until rnd.nextInt(20)).map(_ =>
        if (rnd.nextBoolean()) "aa" else "bb").mkString(" "))
    }.toDF("doc_id", "text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (docs <- Seq(fuzz, real); (k, w) <- Seq((3, 4), (4, 4), (2, 2))) {
      val win = Winnow.fingerprints(docs, "doc_id", col("text"), k, w)
        .select(col("doc_id"), col("fp")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val native = docs.select(col("doc_id"),
          explode(Winnow.fingerprintSet(col("text"), k, w)).as("fp"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(native === win, s"k=$k w=$w")
    }
  }

  test("fingerprintSet is a zero-exchange map-side projection") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = docs.select(col("doc_id"), Winnow.fingerprintSet(col("text")))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"kernel must not shuffle:\n$plan")
  }

  test("winnow-dedup composition keeps the best-quality representative per cluster") {
    import graft.operators.DupClusters
    val run = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    val docs = Seq(
      (1L, s"$run corto", 12L),
      (2L, s"$run mas largo que uno", 22L),     // longest in cluster → kept
      (3L, s"$run corto tambien aqui", 22L),    // ties 2 on n_chars → id 2 wins
      (9L, "sin parecido alguno en absoluto con los otros documentos aqui", 61L)
    ).toDF("doc_id", "text", "n_chars")
    val pairs = graft.operators.Winnow.overlapPairs(docs, "doc_id",
      col("text"), k = 4, w = 4, minShared = 2, maxDf = 64)
    val kept = DupClusters.clusterDedup(docs, "doc_id", pairs,
        order = Seq(col("n_chars"), col("doc_id") * -1))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 9L))
  }

  test("plan: one exchange into the window sort; overlap join reuses the fp shuffle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fp = Winnow.fingerprints(docs, "doc_id", col("text"))
    val fpPlan = fp.queryExecution.executedPlan.toString
    assert(fpPlan.contains("Window"))
    assert(!fpPlan.contains("CartesianProduct") && !fpPlan.contains("BroadcastNestedLoop"))
    // ReusedExchange is an AQE/runtime artifact — check the EXECUTED plan
    val ov = Winnow.overlapPairs(docs, "doc_id", col("text"))
    ov.write.mode("overwrite").format("noop").save()
    val executed = ov.queryExecution.executedPlan.toString
    assert(!executed.contains("CartesianProduct") &&
      !executed.contains("BroadcastNestedLoop"))
  }
}
