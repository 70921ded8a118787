package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, IngestCli, Tables}
import graft.operators

/** Throwaway diagnostic: replicate q150's corpus checkpoint structure
  * step by step and print which steps recompute the synth (via the
  * accumulated storage info + per-step wall). */
object ScratchQ150 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def storage(): Unit = {
      val infos = spark.sparkContext.getRDDStorageInfo
      infos.foreach { i =>
        println(s"  rdd=${i.id} name=${i.name} cached=${i.numCachedPartitions}/${i.numPartitions} mem=${i.memSize / 1024 / 1024}MB disk=${i.diskSize / 1024 / 1024}MB")
      }
      if (infos.isEmpty) println("  (no cached rdds)")
    }

    val corpus = operators.Video.syntheticCorpus(
        Tables.documents(spark, sfDir).select("doc_id"), "doc_id",
        variantsPerScene = 3, corruptEvery = 97)
      .localCheckpoint(eager = false)

    t("sigs write (materialize)") {
      operators.Video.frameSignatures(corpus, "doc_id", col("content"), 2)
        .write.mode("overwrite").parquet("/tmp/scratch_q150_sigs")
    }
    storage()
    val mid = t("mid agg") { corpus.agg(max(col("doc_id")) / 2).head().getDouble(0) }
    storage()
    t("filter+count wave1 ids") { corpus.filter(col("doc_id") <= mid).count() }
    t("decode wave1") {
      operators.Video.frameSignatures(corpus.filter(col("doc_id") <= mid),
        "doc_id", col("content"), 2).write.format("noop").mode("overwrite").save()
    }
    storage()
    // the actual wave, with job descriptions visible
    val st = IngestCli.initVideoState(spark, "graft_scratch_video",
      "/tmp/scratch_q150_state", maxHamming = 8, minFrames = 2,
      everyNth = 2, numBuckets = 8)
    // ---- inline the ingestVideoWave body with per-step walls ----
    for (waveNo <- 1 to 2) {
      println(s"---- wave $waveNo ----")
      val wave =
        if (waveNo == 1) corpus.filter(col("doc_id") <= mid)
        else corpus.filter(col("doc_id") > mid)
      val tombs = spark.table(st.tombTable)
      val live = operators.Incremental.retractIds(wave, "doc_id", tombs)
      val sigs = operators.Video.frameSignatures(live, "doc_id",
          col("content"), st.everyNth)
        .localCheckpoint(eager = false)
      val decodedIds = sigs.select("doc_id").distinct()
      if (waveNo == 1) {
        t("decode + count")(decodedIds.count())
        t("audit counts")(wave.count()) // stand-in for waveAuditCounts cost class
      } else {
        t("par2 audit||decode") {
          operators.Actions.par2(wave.count(), decodedIds.count())
        }
      }
      val blockedIds = spark.range(0).select(col("id").as("doc_id"))
      val admitted = sigs.join(blockedIds, Seq("doc_id"), "left_anti")
      val inWaveDups = operators.Video.clipNearDupPairs(admitted, "doc_id",
          st.maxHamming, st.minFrames)
        .select(col("id_b").as("doc_id"))
      val stateDups = operators.Incremental.frameHammingDupIdsAgainstTable(
        admitted, "doc_id", "dhash", spark.table(st.sigTable), st.maxHamming,
        st.minFrames, everyNth = st.everyNth,
        signer = Some(IngestCli.VideoSignerName))
      val dropIds = inWaveDups.union(stateDups).distinct()
        .localCheckpoint(eager = false)
      t("drop ids count")(dropIds.count())
      t("state append") {
        operators.Incremental.appendFrameHammingState(admitted, "doc_id",
          "dhash", st.sigTable, st.maxHamming, st.numBuckets,
          everyNth = st.everyNth, signer = Some(IngestCli.VideoSignerName))
      }
      val accepted = live
        .join(blockedIds, Seq("doc_id"), "left_anti")
        .join(dropIds, Seq("doc_id"), "left_anti")
      t("gold append") {
        accepted.withColumn("ingest_wave", lit(waveNo))
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .partitionBy("ingest_wave").parquet(st.goldPath)
      }
      t("gold count")(spark.read.parquet(st.goldPath).count())
      storage()
    }
    // ---- the REAL function, fresh state, same JVM ----
    val st2 = IngestCli.initVideoState(spark, "graft_scratch_video2",
      "/tmp/scratch_q150_state2", maxHamming = 8, minFrames = 2,
      everyNth = 2, numBuckets = 8)
    t("REAL ingestVideoWave 1") {
      IngestCli.ingestVideoWave(spark, st2, corpus.filter(col("doc_id") <= mid), 1)
    }
    t("REAL ingestVideoWave 2") {
      IngestCli.ingestVideoWave(spark, st2, corpus.filter(col("doc_id") > mid), 2)
    }
    storage()
    spark.stop()
  }
}
