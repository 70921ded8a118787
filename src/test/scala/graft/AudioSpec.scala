package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Audio

/** Real WAV (RIFF/PCM) decode + energy-contour fingerprint: decoded
  * samples round-trip the synthesized bytes exactly, the eHash is
  * gain-invariant and time-local, corrupt payloads quarantine, and
  * the Hamming machinery returns the exact pair set. */
class AudioSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("decodePcm round-trips the synthesized RIFF exactly (16-bit mono)") {
    val bytes = Audio.syntheticWav(scene = 9L, variant = 0)
    val Some((sr, ch, mono)) = Audio.decodePcm(bytes)
    assert(sr === 8000 && ch === 1 && mono.length === 6500)
    // deterministic: same scene -> same samples -> same hash
    val Some((_, _, mono2)) = Audio.decodePcm(Audio.syntheticWav(9L, 0))
    assert(mono.sameElements(mono2))
  }

  test("multi-channel mixdown, 8-bit PCM, chunk skipping, truncation tolerance") {
    // hand-built stereo 16-bit WAV with an unknown chunk before data:
    // L = 1000, R = 3000 -> mono 2000
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes("US-ASCII")); w32(1000)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("LIST".getBytes("US-ASCII")); w32(4); w32(0) // skipped chunk
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1); w16(2); w32(8000); w32(32000); w16(4); w16(16)
    out.write("data".getBytes("US-ASCII")); w32(16)
    (0 until 4).foreach { _ => w16(1000); w16(3000) }
    val Some((sr, ch, mono)) = Audio.decodePcm(out.toByteArray)
    assert(sr === 8000 && ch === 2 && mono.toSeq === Seq(2000, 2000, 2000, 2000))

    // 8-bit: unsigned samples center at 128
    val o8 = new java.io.ByteArrayOutputStream()
    def w16b(v: Int): Unit = { o8.write(v & 0xFF); o8.write((v >> 8) & 0xFF) }
    def w32b(v: Int): Unit = { w16b(v & 0xFFFF); w16b((v >>> 16) & 0xFFFF) }
    o8.write("RIFF".getBytes("US-ASCII")); w32b(100)
    o8.write("WAVE".getBytes("US-ASCII"))
    o8.write("fmt ".getBytes("US-ASCII")); w32b(16)
    w16b(1); w16b(1); w32b(8000); w32b(8000); w16b(1); w16b(8)
    o8.write("data".getBytes("US-ASCII")); w32b(3)
    o8.write(128); o8.write(130); o8.write(126)
    val Some((_, _, m8)) = Audio.decodePcm(o8.toByteArray)
    assert(m8.toSeq === Seq(0, 2, -2))

    // truncated data chunk still yields the available samples
    val full = Audio.syntheticWav(3L, 0)
    val Some((_, _, part)) = Audio.decodePcm(full.take(full.length - 100))
    assert(part.length === 6450)
  }

  test("undecodable payloads -> None, never a throw") {
    assert(Audio.decodePcm(null).isEmpty)
    assert(Audio.decodePcm(Array.emptyByteArray).isEmpty)
    assert(Audio.decodePcm(Array[Byte]('R', 'I', 'F', 'F', 1)).isEmpty)
    assert(Audio.decodePcm("not audio at all, just text padding!!!!!!!!!!!"
      .getBytes("US-ASCII")).isEmpty)
    val rnd = new scala.util.Random(5)
    (0 until 50).foreach { _ =>
      Audio.decodePcm(Array.fill(rnd.nextInt(300))(rnd.nextInt().toByte))
    }
  }

  test("eHash: gain-invariant, time-local variants, distinct scenes far") {
    def hashOf(b: Array[Byte]): Long = {
      val Some((_, _, m)) = Audio.decodePcm(b); Audio.eHash64(m)
    }
    val base = (0L until 40L).map(s => s -> hashOf(Audio.syntheticWav(s, 0))).toMap
    // uniform gain change: EXACTLY the same hash (monotone transform)
    (0L until 40L).foreach { s =>
      assert(hashOf(Audio.syntheticWav(s, 0, gainNum = 5, gainDen = 4)) === base(s),
        s"gain flipped bits for scene $s")
      assert(hashOf(Audio.syntheticWav(s, 0, gainNum = 1, gainDen = 2)) === base(s))
    }
    // 3-frame variants flip at most 4 bits
    (0L until 40L).foreach { s =>
      (1 to 2).foreach { v =>
        val d = ham(base(s), hashOf(Audio.syntheticWav(s, v)))
        assert(d <= 4, s"variant $v of scene $s drifted $d bits")
      }
    }
    val cross = for (a <- 0L until 40L; b <- (a + 1) until 40L)
      yield ham(base(a), base(b))
    assert(cross.min > 8, s"closest distinct-scene pair: ${cross.min} bits")
  }

  test("audioSignatures: flags, duration math, corrupt quarantine, determinism") {
    val clips = Audio.syntheticCorpus(
      spark.range(0, 120).toDF("doc_id"), "doc_id",
      variantsPerScene = 3, corruptEvery = 40)
    val sigs = Audio.audioSignatures(clips, "doc_id", col("content")).cache()
    assert(sigs.count() === 120)
    assert(sigs.filter(!col("decoded")).select("doc_id").as[Long].collect().sorted
      .toSeq === Seq(0L, 40L, 80L))
    assert(sigs.filter(col("decoded"))
      .filter(col("sample_rate") =!= 8000 || col("n_samples") =!= 6500 ||
        col("duration_ms") =!= 812L).count() === 0)
    val Some((_, _, m)) = Audio.decodePcm(Audio.syntheticWav(7L, 1)) // id 22
    assert(sigs.filter(col("doc_id") === 22).select("ehash").as[Long].head()
      === Audio.eHash64(m))
    sigs.unpersist(blocking = false)
  }

  test("near-dup pairs == brute force; dedup keeps bases + corrupt rows") {
    val clips = Audio.syntheticCorpus(
      spark.range(0, 90).toDF("doc_id"), "doc_id",
      variantsPerScene = 3, corruptEvery = 0)
    val sigs = Audio.audioSignatures(clips, "doc_id", col("content")).cache()
    val vals = sigs.select("doc_id", "ehash").as[(Long, Long)].collect()
    val brute = (for { (ia, sa) <- vals; (ib, sb) <- vals
      if ia < ib && ham(sa, sb) <= 8 } yield (ia, ib)).toSet
    val engine = operators.Dedup.hammingNearDupPairs(sigs, "doc_id", "ehash", 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(engine === brute)
    val planted = (0L until 90L by 3L).flatMap(b => Seq((b, b + 1), (b, b + 2))).toSet
    assert(planted.subsetOf(engine), s"missed: ${planted.diff(engine).take(5)}")
    sigs.unpersist(blocking = false)

    val kept = Audio.audioNearDedup(
        Audio.syntheticCorpus(spark.range(0, 120).toDF("doc_id"), "doc_id",
          variantsPerScene = 3, corruptEvery = 40),
        "doc_id", col("content"), maxHamming = 8)
      .select("doc_id").as[Long].collect().toSet
    val expected = (0L until 120L).filter { id =>
      val corrupt = id % 40 == 0
      val base = (id / 3) * 3
      corrupt || id == base || (base % 40 == 0 && id == base + 1)
    }.toSet
    assert(kept === expected)
  }

  test("shardCols bound the self-join: within-shard pairs only, constant shard == unsharded") {
    val clips = Audio.syntheticCorpus(
      spark.range(0, 90).toDF("doc_id"), "doc_id",
      variantsPerScene = 3, corruptEvery = 0)
    val sigs = Audio.audioSignatures(clips, "doc_id", col("content"))
      .withColumn("source", expr("doc_id div 30"))
      .withColumn("all_one", lit(1)).cache()
    val unsharded = operators.Dedup.hammingNearDupPairs(
        sigs, "doc_id", "ehash", 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // a CONSTANT shard key changes nothing — the knob is pure scoping
    val constant = operators.Dedup.hammingNearDupPairs(
        sigs, "doc_id", "ehash", 8, shardCols = Seq("all_one"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(constant === unsharded)
    // a partitioning shard key = exactly the within-shard subset
    val sharded = operators.Dedup.hammingNearDupPairs(
        sigs, "doc_id", "ehash", 8, shardCols = Seq("source"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sharded === unsharded.filter { case (a, b) => a / 30 == b / 30 })
    // scenes are 3 ids and shards 30, so every planted pair survives
    // sharding — the knob severs only out-of-scope pairs
    val planted = (0L until 90L by 3L).flatMap(b => Seq((b, b + 1), (b, b + 2))).toSet
    assert(planted.subsetOf(sharded))
    // NULL shard values form ONE group (groupBy convention): scene 0's
    // pair with both sources null must still dedup; a null-vs-non-null
    // pair must not. A raw equi-join would silently exempt ALL null
    // rows — the regression this pins
    val nullish = sigs.withColumn("source",
      when(col("doc_id") <= 1, lit(null).cast("long"))
        .otherwise(lit(7L)))
    val nullPairs = operators.Dedup.hammingNearDupPairs(
        nullish, "doc_id", "ehash", 8, shardCols = Seq("source"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nullPairs.contains((0L, 1L)),
      "both-null shard rows must pair (one group)")
    assert(!nullPairs.contains((0L, 2L)) && !nullPairs.contains((1L, 2L)),
      "null vs non-null shard must not pair")
    sigs.unpersist(blocking = false)
  }
}
