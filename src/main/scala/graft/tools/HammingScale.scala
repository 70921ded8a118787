package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Incremental

/** Scratch rehearsal: the incremental Hamming probe
  * ([[Incremental.hammingDupIdsAgainstTable]]) against state grown to
  * 1×/10×/100× with the BATCH size held fixed — the flatness claim's
  * strongest test (a recurring wave's probe cost must be batch-sized,
  * not corpus-sized). Not part of the library surface.
  *
  * Signatures are synthetic but ADVERSARIAL, not uniform: the low 20
  * bits are near-constant (only 2 vary), reproducing the measured
  * perceptual-hash bit-entropy skew that collapsed contiguous bands
  * into one giant bucket (127,665 of 127,910 audio signatures shared
  * one low-bits bucket at 30× — SCALING.md) — so the rehearsal
  * stresses exactly the shape the strided layout exists to absorb, at
  * scales the media fixtures can't cheaply reach (100× state would be
  * ~1M distinct images to decode). Half the batch is planted one bit
  * from a state signature (hits), half is fresh (misses).
  *
  * Usage: runMain graft.tools.HammingScale [scales] [stateBase] [batchN]
  *   defaults: scales=1,10,100 stateBase=30000 batchN=30000
  * State builds are OFF the clock (the op_bm25_probe stance); probe
  * walls print best-of-2.
  */
object HammingScale {

  /** Skewed synthetic signature of `id` as a Column: PRF high 44
    * bits, near-constant low 20 (two varying bits) — the entropy
    * shape of a real perceptual hash over a homogeneous corpus. */
  private def skewSig(id: org.apache.spark.sql.Column) = {
    val h = xxhash64(id)
    h.bitwiseAND(lit(0xFFFFFFFFFFF00000L))
      .bitwiseOR(lit(0x5A5A0L))
      .bitwiseOR(h.bitwiseAND(lit(0x11L)))
  }

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val stateBase = args.lift(1).map(_.toInt).getOrElse(30000)
    val batchN = args.lift(2).map(_.toInt).getOrElse(30000)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft-hscale").toString
    sys.addShutdownHook {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }

    // fixed batch, fixed 50% hit rate AT EVERY SCALE so the measured
    // curve is pure probe-cost scaling: even rows are one flipped
    // high bit from a state signature that exists at scale 1× already
    // (base id < stateBase — guaranteed hits); odd rows INVERT the
    // near-constant low 20 bits, putting them ≥ 18 bits from every
    // state signature (guaranteed misses — no saturation as the
    // state's Hamming-8 balls accumulate)
    val batch = spark.range(batchN).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0,
        skewSig(expr("id div 2") % stateBase)
          .bitwiseXOR(shiftleft(lit(1L), 21)))
        .otherwise(skewSig(col("id")).bitwiseXOR(lit(0xFFFFFL))).as("sig"))

    scales.foreach { scale =>
      val n = stateBase.toLong * scale
      val table = s"graft_hscale_$scale"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val t0 = System.nanoTime()
      Incremental.writeHammingState(
        spark.range(n).select(col("id").as("doc_id"),
          skewSig(col("id")).as("sig")),
        "doc_id", "sig", table, s"$tmp/state_$scale",
        maxHamming = 8, numBuckets = 8)
      val buildS = (System.nanoTime() - t0) / 1e9
      def probe(): Double = {
        val p0 = System.nanoTime()
        val hits = Incremental.hammingDupIdsAgainstTable(batch, "doc_id",
          "sig", spark.table(table), maxHamming = 8).count()
        val dt = (System.nanoTime() - p0) / 1e9
        System.gc(); Thread.sleep(200)
        println(f"  sample: probe=$dt%.2f s hits=$hits")
        dt
      }
      val best = math.min(probe(), probe())
      println(f"SCALE ${scale}x: state=$n%,d sigs build=$buildS%.1f s " +
        f"probe_best=$best%.2f s (batch=$batchN%,d)")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }

    // ---- positional (video frame) state, same experiment: fixed
    // wave of batchClips clips × 4 sampled positions against state
    // grown 1×/10×/100×. Even clips are planted hits (all 4 positions
    // one bit from a scale-1× state clip), odd clips guaranteed
    // misses (inverted low bits) — fixed hit rate at every scale.
    val batchClips = batchN / 4
    val frameBatch = spark.range(batchClips * 4L).select(
      expr("id div 4").as("doc_id"),
      (col("id") % 4).cast("int").as("frame_pos"),
      when(expr("id div 4") % 2 === 0,
        skewSig(expr("id div 8") % stateBase * 4 + col("id") % 4)
          .bitwiseXOR(shiftleft(lit(1L), 21)))
        .otherwise(skewSig(col("id")).bitwiseXOR(lit(0xFFFFFL)))
        .as("dhash"))
    scales.foreach { scale =>
      val nClips = stateBase.toLong * scale
      val table = s"graft_fhscale_$scale"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val t0 = System.nanoTime()
      Incremental.writeFrameHammingState(
        spark.range(nClips * 4).select(
          expr("id div 4").as("doc_id"),
          (col("id") % 4).cast("int").as("frame_pos"),
          skewSig(col("id")).as("dhash")),
        "doc_id", "dhash", table, s"$tmp/fstate_$scale",
        maxHamming = 8, numBuckets = 8, everyNth = 1)
      val buildS = (System.nanoTime() - t0) / 1e9
      def probe(): Double = {
        val p0 = System.nanoTime()
        val hits = Incremental.frameHammingDupIdsAgainstTable(frameBatch,
          "doc_id", "dhash", spark.table(table), maxHamming = 8,
          minFrames = 2, everyNth = 1).count()
        val dt = (System.nanoTime() - p0) / 1e9
        System.gc(); Thread.sleep(200)
        println(f"  sample: frame_probe=$dt%.2f s hits=$hits")
        dt
      }
      val best = math.min(probe(), probe())
      println(f"FRAME SCALE ${scale}x: state=$nClips%,d clips (x4 frames) " +
        f"build=$buildS%.1f s probe_best=$best%.2f s (batch=$batchClips%,d clips)")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
    spark.stop()
  }
}
