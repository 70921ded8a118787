package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Images, Video}

/** MJPEG-in-AVI decode + clip-level near-dup: the RIFF walk finds the
  * movi frames, every frame decodes through the exact image pipeline,
  * variants overlap partially (not fully), distinct scenes never
  * match, corrupt payloads quarantine. */
class VideoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("aviFrames: frame extraction, corruption tolerance, truncation") {
    val avi = Video.syntheticAvi(scene = 4L, variant = 0, nFrames = 8)
    val Some(frames) = Video.aviFrames(avi)
    assert(frames.length === 8)
    // every frame is a decodable JPEG with the expected geometry
    frames.foreach { f =>
      val Some((w, h, _)) = Images.decodeGray(f)
      assert(w === 32 && h === 32)
    }
    // deterministic bytes
    assert(Video.syntheticAvi(4L, 0).sameElements(avi))
    // corruption and non-AVI input
    assert(Video.aviFrames(null).isEmpty)
    assert(Video.aviFrames(Array[Byte]('R', 'I', 'F', 'F', 2)).isEmpty)
    assert(Video.aviFrames("RIFFxxxxWAVE1234".getBytes("US-ASCII")).isEmpty)
    val rnd = new scala.util.Random(3)
    (0 until 40).foreach { _ =>
      Video.aviFrames(Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte))
    }
    // truncation mid-movi still yields the complete leading frames
    val Some(partial) = Video.aviFrames(avi.take(avi.length - 40))
    assert(partial.length >= 1 && partial.length <= 8)
    // wrap-around chunk sizes must TERMINATE (quarantine), not hang:
    // 8 + 0xFFFFFFF8 (or 0xFFFFFFF7 + odd pad) wraps .toInt to 0 and
    // the pre-guard scan never advanced — a 24-byte file hung the task
    def wrapAvi(sz: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(16)
      b.put("AVI ".getBytes("US-ASCII"))
      b.put("JUNK".getBytes("US-ASCII")).putInt(sz.toInt)
      b.putInt(0)
      b.array()
    }
    assert(Video.aviFrames(wrapAvi(0xFFFFFFF8L)).isEmpty)
    assert(Video.aviFrames(wrapAvi(0xFFFFFFF7L)).isEmpty)
    // same wrap declared INSIDE a movi list: the scan must stop at the
    // clamped end instead of looping; the truncated frame still decodes
    val inMovi = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    inMovi.put("RIFF".getBytes("US-ASCII")).putInt(32)
    inMovi.put("AVI ".getBytes("US-ASCII"))
    inMovi.put("LIST".getBytes("US-ASCII")).putInt(24)
    inMovi.put("movi".getBytes("US-ASCII"))
    inMovi.put("00dc".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
    inMovi.putLong(0x1111111111111111L)
    val Some(clamped) = Video.aviFrames(inMovi.array())
    assert(clamped.length === 1 && clamped.head.length === 8)
  }

  test("frameSignatures: stride sampling, cross-modality signature identity") {
    val clips = Video.syntheticCorpus(spark.range(0, 30).toDF("doc_id"),
      "doc_id", corruptEvery = 10)
    val sigs = Video.frameSignatures(clips, "doc_id", col("content"),
      everyNth = 2).cache()
    // 8 frames, stride 2 -> 4 sampled positions per decodable clip
    val perClip = sigs.groupBy("doc_id").count()
    assert(perClip.filter(col("count") =!= 4).count() === 0)
    // corrupt clips (0, 10, 20) emit no frame rows
    assert(sigs.filter(col("doc_id").isin(0L, 10L, 20L)).count() === 0)
    assert(sigs.select("doc_id").distinct().count() === 27)
    // a frame hashed through the video path == the same pixels hashed
    // through the image path (shared decode/hash pipeline)
    val Some(frames) = Video.aviFrames(Video.syntheticAvi(1L, 0)) // doc_id 3
    val Some((w, h, g)) = Images.decodeGray(frames(2)) // sample idx 1
    val engine = sigs.filter(col("doc_id") === 3 && col("frame_pos") === 1)
      .select("dhash").as[Long].head()
    assert(engine === Images.dHash64(w, h, g))
    sigs.unpersist(blocking = false)
  }

  test("clipNearDupPairs: partial-overlap variants match, distinct scenes never; brute-force parity") {
    val clips = Video.syntheticCorpus(spark.range(0, 60).toDF("doc_id"),
      "doc_id", corruptEvery = 0)
    val sigs = Video.frameSignatures(clips, "doc_id", col("content"),
      everyNth = 2).cache()
    val pairs = Video.clipNearDupPairs(sigs, "doc_id",
        maxHamming = 8, minFrames = 2)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, m) => (a, b) -> m }.toMap
    // brute force from the same signatures
    val rows = sigs.select("doc_id", "frame_pos", "dhash")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val brute = (for {
      a <- rows.keys; b <- rows.keys; if a < b
      m = rows(a).keySet.intersect(rows(b).keySet).count(p =>
        java.lang.Long.bitCount(rows(a)(p) ^ rows(b)(p)) <= 8)
      if m >= 2
    } yield (a, b) -> m.toLong).toMap
    assert(pairs === brute)
    // planted: variants match their scene on EXACTLY 3 of 4 sampled
    // positions (frame 2 = sample 1 was rewritten) — partial overlap,
    // not identity
    (0L until 60L by 3L).foreach { base =>
      assert(pairs.get((base, base + 1)).contains(3L), s"scene ${base / 3}")
      assert(pairs.get((base, base + 2)).contains(3L))
    }
    // no cross-scene pair anywhere
    assert(pairs.keys.forall { case (a, b) => a / 3 == b / 3 })
    sigs.unpersist(blocking = false)
  }

  test("shardCols bound the clip self-join: within-shard pairs only, constant shard == unsharded") {
    val clips = Video.syntheticCorpus(spark.range(0, 30).toDF("doc_id"),
      "doc_id", variantsPerScene = 3, corruptEvery = 0)
    val sigs = Video.frameSignatures(clips, "doc_id", col("content"),
        everyNth = 2)
      .withColumn("source", expr("doc_id div 15"))
      .withColumn("all_one", lit(1)).cache()
    def pairsOf(shard: Seq[String]) = Video.clipNearDupPairs(sigs,
        "doc_id", maxHamming = 8, minFrames = 2, shardCols = shard)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val unsharded = pairsOf(Nil)
    // a CONSTANT shard key changes nothing — the knob is pure scoping
    assert(pairsOf(Seq("all_one")) === unsharded)
    // a partitioning shard key = exactly the within-shard subset;
    // scenes are 3 ids and shards 15, so no scene straddles a boundary
    // and every planted pair survives
    val sharded = pairsOf(Seq("source"))
    assert(sharded === unsharded.filter { case (a, b) => a / 15 == b / 15 })
    val planted = (0L until 30L by 3L)
      .flatMap(b => Seq((b, b + 1), (b, b + 2))).toSet
    assert(planted.subsetOf(sharded))
    // null shard values form ONE group (struct packing): scene 0's
    // both-null pair still dedups; null-vs-non-null must not pair
    val nullish = sigs.withColumn("source",
      when(col("doc_id") <= 1, lit(null).cast("long"))
        .otherwise(lit(7L)))
    val nullPairs = Video.clipNearDupPairs(nullish, "doc_id",
        maxHamming = 8, minFrames = 2, shardCols = Seq("source"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nullPairs.contains((0L, 1L)),
      "both-null shard rows must pair (one group)")
    assert(!nullPairs.contains((0L, 2L)) && !nullPairs.contains((1L, 2L)),
      "null vs non-null shard must not pair")
    sigs.unpersist(blocking = false)
  }

  test("fuzz: aviFrames is total — noise, mutations, and truncations return, never throw or hang") {
    val rnd = new scala.util.Random(41)
    // pure noise, with and without the RIFF/AVI magic (the 24-byte
    // wrap-hang reproducer class: corrupt sizes near 0xFFFFFFFF)
    for (_ <- 1 to 25) {
      val b = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(b)
      Video.aviFrames(b) // may be None or Some — must return
      val magic = "RIFF".getBytes ++ b.take(4) ++ "AVI ".getBytes ++ b
      Video.aviFrames(magic)
    }
    // structured corruption: a valid clip with random bytes flipped —
    // the walk may lose frames or quarantine but must return; a
    // surviving frame set must still dHash cleanly downstream
    val base = Video.syntheticAvi(scene = 7L, variant = 0, nFrames = 4)
    for (_ <- 1 to 40) {
      val b = base.clone()
      for (_ <- 0 to rnd.nextInt(24)) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Video.aviFrames(b).foreach(_.foreach(f => Images.decodeGray(f)))
    }
    // every truncation point of the container (chunk-boundary class)
    (0 until base.length by 97).foreach { n =>
      Video.aviFrames(java.util.Arrays.copyOf(base, n))
    }
    // clipBlocked is total over the same hostile inputs
    val idx = operators.Dedup.hammingIndex(
      Video.frameSignatures(
        Video.syntheticCorpus(Seq(21L).toDF("doc_id"), "doc_id",
          corruptEvery = 0),
        "doc_id", col("content"), everyNth = 2)
        .filter(col("frame_pos") === 0),
      "dhash", maxHamming = 8)
    for (_ <- 1 to 10) {
      val b = base.clone()
      for (_ <- 0 to rnd.nextInt(24)) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Video.clipBlocked(b, idx, everyNth = 2) // boolean either way
    }
    assert(Video.clipBlocked(null, idx) === false, "null bytes never block")
  }

  test("videoNearDedup: scene bases + corrupt clips survive") {
    val kept = Video.videoNearDedup(
        Video.syntheticCorpus(spark.range(0, 120).toDF("doc_id"), "doc_id",
          variantsPerScene = 3, corruptEvery = 40),
        "doc_id", col("content"), everyNth = 2, maxHamming = 8, minFrames = 2)
      .select("doc_id").as[Long].collect().toSet
    val expected = (0L until 120L).filter { id =>
      val corrupt = id % 40 == 0
      val base = (id / 3) * 3
      corrupt || id == base || (base % 40 == 0 && id == base + 1)
    }.toSet
    assert(kept === expected)
  }
}
