package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The recurring-ingestion wave loop: three waves + a takedown, with
  * gold asserted IDENTICAL to the from-scratch batch pipeline over the
  * union after every step — including the round-5 chain shape (a doc
  * similar only to an already-DROPPED doc must still drop) and
  * content-keyed digest compaction on takedown. */
class IngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 80-word deterministic texts; near-dup structure via 18-word block
  // replacement (J(base, nd) ~ 0.6 >= 0.5 threshold; J across TWO
  // replacements ~ 0.32 < 0.5 — the chain geometry)
  private def words(tag: String, n: Int, from: Int = 0): Seq[String] =
    (from until from + n).map(i => s"$tag$i")
  private val textA = words("a", 80).mkString(" ")
  private val textB = words("b", 80).mkString(" ")
  private val textC = words("c", 80).mkString(" ")
  private val textD = words("d", 80).mkString(" ")
  private val textE = words("e", 80).mkString(" ")
  // nd1 ~ A (last 18 words replaced); nd2 ~ nd1 but NOT ~ A (first 18
  // of nd1 replaced)
  private val nd1 = (words("a", 62) ++ words("x", 18)).mkString(" ")
  private val nd2 = (words("y", 18) ++ words("a", 44, from = 18) ++
    words("x", 18)).mkString(" ")

  private val cfg = GraftConfig(minTextLength = 3, maxTextLength = 10000,
    fuzzyThreshold = 0.5)

  private def df(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val wave1 = df(1L -> textA, 2L -> textB, 3L -> "ab", 4L -> textE)
  private val wave2 = df(11L -> textA, 12L -> nd1, 13L -> textC, 14L -> nd1)
  private val wave3 = df(21L -> nd2, 22L -> nd1, 23L -> textD)

  private def goldIds(path: String): Set[Long] =
    spark.read.parquet(path).select("doc_id").as[Long].collect().toSet
  private def batchIds(union: DataFrame): Set[Long] =
    IngestCli.batchEquivalent(union, cfg)
      .select("doc_id").as[Long].collect().toSet

  test("three waves: gold == from-scratch batch over the union after every wave") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val st = IngestCli.initState(spark, "graft_ingest_t1", dir, numBuckets = 4)

    val r1 = IngestCli.ingestWave(spark, st, wave1, 1, cfg)
    assert(r1.gated === 3) // "ab" fails the length gate
    assert(goldIds(st.goldPath) === Set(1L, 2L, 4L))
    assert(goldIds(st.goldPath) === batchIds(wave1))

    val r2 = IngestCli.ingestWave(spark, st, wave2, 2, cfg)
    // 11 exact-dups state A; 14 exact-dups in-wave 12; 12 near-dups
    // state A; 13 is fresh
    assert(r2.accepted === 1)
    assert(goldIds(st.goldPath) === Set(1L, 2L, 4L, 13L))
    assert(goldIds(st.goldPath) === batchIds(wave1.union(wave2)))

    val r3 = IngestCli.ingestWave(spark, st, wave3, 3, cfg)
    // THE CHAIN: 21 (nd2) is similar ONLY to nd1 (id 12) — which was
    // itself dropped — and must still drop (seen-not-kept state);
    // 22 exact-dups the DROPPED 12's digest (exact survivors feed the
    // digest state); 23 is fresh
    assert(r3.accepted === 1)
    assert(goldIds(st.goldPath) === Set(1L, 2L, 4L, 13L, 23L))
    assert(goldIds(st.goldPath) ===
      batchIds(wave1.union(wave2).union(wave3)))

    // sanity on the planted geometry: nd2 alone with A is NOT a
    // near-dup pair (otherwise the chain assert is vacuous — 21 would
    // drop via A directly, not via the dropped 12)
    assert(batchIds(df(1L -> textA, 21L -> nd2)) === Set(1L, 21L))
  }

  test("takedown: tombstones gate re-entry, digest state compacts by content, gold rewrites") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest2").toString
    var st = IngestCli.initState(spark, "graft_ingest_t2", dir, numBuckets = 4)
    IngestCli.ingestWave(spark, st, wave1, 1, cfg)
    IngestCli.ingestWave(spark, st, wave2, 2, cfg)

    // retract id 2 (textB — no dups anywhere, so from-scratch over the
    // retained union agrees with the incremental gold exactly)
    st = IngestCli.applyTakedown(spark, st, Seq(2L).toDF("doc_id"))
    assert(goldIds(st.goldPath) === Set(1L, 4L, 13L))
    // signature state lost id 2's rows; digest state lost textB's key
    assert(spark.table(st.sigTable).filter(col("doc_id") === 2L).count() === 0)

    // wave 4: the retracted ID cannot re-enter (tombstone gate), but
    // NEW content identical to the retracted text is accepted again —
    // its digest was compacted away (content-keyed retraction)
    val wave4 = df(2L -> textB, 31L -> textB)
    val r4 = IngestCli.ingestWave(spark, st, wave4, 4, cfg)
    assert(r4.incoming === 2 && r4.live === 1)
    assert(r4.accepted === 1)
    assert(goldIds(st.goldPath) === Set(1L, 4L, 13L, 31L))
    // from-scratch equivalence on the retained union
    val retainedUnion = wave1.union(wave2).union(wave4)
      .filter(col("doc_id") =!= 2L)
    assert(goldIds(st.goldPath) === batchIds(retainedUnion))

    // idempotent re-submission of the same takedown
    st = IngestCli.applyTakedown(spark, st, Seq(2L).toDF("doc_id"))
    assert(goldIds(st.goldPath) === Set(1L, 4L, 13L, 31L))
  }

  test("wave probes only shuffle the batch side (state arrives bucket-aligned)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest3").toString
    val st = IngestCli.initState(spark, "graft_ingest_t3", dir, numBuckets = 4)
    IngestCli.ingestWave(spark, st, wave1, 1, cfg)
    // at fixture scale the planner rightly broadcasts the tiny state
    // (and drops the bucket read); the claim under test is the
    // AT-SCALE shape — force the SMJ path the way a 100 TB state
    // plans, then assert the state side streams bucket-aligned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = operators.Incremental.exactDedupAgainstTable(
        wave2, col("text"), spark.table(st.digestTable))
      probe.write.mode("overwrite").format("noop").save()
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"state must be bucket-read:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges <= 1, s"only the batch side may shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
