package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Incremental

/** Scratch rehearsal: the incremental-cluster wave append
  * ([[Incremental.appendClusters]]) against cluster state grown with
  * the corpus (isometric `tools/make_scaled.py` replicas) while the
  * WAVE size stays fixed — the flatness claim: a recurring wave's
  * cost must be wave-sized plus a bucket-aligned stream of the gram
  * table, never corpus-shuffling. Not part of the library surface.
  *
  * The wave is copy-0 documents (the replicas' identity copy), so the
  * SAME texts probe every scale; the state holds everything else —
  * growing linearly in documents AND in gram document frequency (the
  * Σ df_wave·df_state fan-out term under test, since rotated copies
  * keep within-copy df structure and add no cross-copy collisions).
  * Two disjoint fixed-size waves run back to back per scale (state
  * growth between them is one wave — noise); min wall reported.
  *
  * Usage: runMain graft.tools.ClusterScale <spec>[,<spec>...]
  *        [waveN=500] [n=4] [threshold=0.4] [mode=gram|winnow]
  * where <spec> is an sfDir, or `synth:<m>:<sfDir>` — an IN-TOOL
  * isometric replica: every copy c suffixes each word with `_c`, so
  * within-copy gram document frequency is preserved exactly and
  * copies never collide (the make_scaled.py property without its
  * vocab-rotation 64-copy cap — the 100× point needs ~100 copies).
  * State builds are OFF the clock (the op_bm25_probe stance). After
  * the two appends, a 10-id takedown OVERLAY lands and resolveClusters
  * is timed — the recurring read path with patches live.
  *
  * `synthbp:<m>:<sfDir>` is the ADVERSARIAL variant: same isometric
  * replicas, but every document in every copy additionally carries
  * one SHARED header and footer (the terms-of-service/nav-chrome
  * shape real crawls have). Boilerplate grams then hit df ≈ corpus
  * size, so the exact-gram probe's Σ df_wave·df_state join fan-out —
  * collision-free in plain `synth:` runs by construction — actually
  * fires and grows with state. The winnow enumerator df-caps those
  * same fingerprints out of the postings (maxDf), so its append must
  * stay flat on the identical corpus: the pair of runs is the
  * quantified case for the production escape hatch.
  */
object ClusterScale {
  def main(args: Array[String]): Unit = {
    val dirs = args.headOption
      .getOrElse("/root/testdata/sf0.1").split(",").toSeq
    val waveN = args.lift(1).map(_.toInt).getOrElse(500)
    val n = args.lift(2).map(_.toInt).getOrElse(4)
    val threshold = args.lift(3).map(_.toDouble).getOrElse(0.4)
    // "gram" = exact n-gram Jaccard enumerator; "winnow" = the
    // df-capped fingerprint enumerator (k=w=4, minShared=2)
    val mode = args.lift(4).getOrElse("gram")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft-cscale").toString
    sys.addShutdownHook {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    dirs.zipWithIndex.foreach { case (dir, i) =>
      val isBp = dir.startsWith("synthbp:")
      // the SAME header/footer on every doc of every copy:
      // boilerplate gram df ≈ corpus size, cross-copy by design
      val bpHead = "site header terms of service apply to every page " +
        "of this corpus archive"
      val bpFoot = "footer navigation home about contact privacy " +
        "policy copyright notice"
      def addBp(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), concat(lit(bpHead + " "), col("text"),
          lit(" " + bpFoot)).as("text"))
      val plain0 =
        if (dir.startsWith("synth:") || isBp) {
          val Array(_, m, base) = dir.split(":", 3)
          val raw = spark.read.parquet(s"$base/documents.parquet")
            .filter(col("doc_id") < 10000000L) // copy-0 only
            .select(col("doc_id"), col("text"))
          raw.select(col("doc_id"), col("text"),
              explode(sequence(lit(0), lit(m.toInt - 1))).as("__c"))
            .select(
              (col("doc_id") + col("__c") * lit(10000000L)).as("doc_id"),
              when(col("__c") === 0, col("text")).otherwise(
                array_join(transform(split(col("text"), " "),
                  w => concat(w, lit("_"), col("__c"))), " ")).as("text"))
        } else spark.read.parquet(s"$dir/documents.parquet")
      val docs0 = if (isBp) addBp(plain0) else plain0
      // synthesized copies are narrow map work, but the build must
      // not recompute them per consumer
      val docs = docs0.localCheckpoint(true)
      val total = docs.count()
      // two disjoint copy-0 waves off the state's tail; ids are
      // copy-0 (< 10M ID_STRIDE) at every scale, so the same texts
      // probe 1x and 30x state
      val w1Lo = 5000L - 2L * waveN
      val waveA = docs.filter(col("doc_id") >= w1Lo &&
        col("doc_id") < w1Lo + waveN)
      val waveB = docs.filter(col("doc_id") >= w1Lo + waveN &&
        col("doc_id") < 5000L)
      val state = docs.filter(col("doc_id") < w1Lo ||
        col("doc_id") >= 5000L)
      val t = Incremental.ClusterTables(
        s"cscale_post_$i", s"$tmp/post_$i",
        s"cscale_member_$i", s"$tmp/member_$i",
        s"cscale_alias_$i", s"$tmp/alias_$i",
        s"cscale_edges_$i", s"$tmp/edges_$i", numBuckets = 16)
      Seq(t.postTable, t.memberTable, t.aliasTable, t.edgeTable)
        .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))
      val b0 = System.nanoTime()
      if (mode == "winnow")
        // feasible directly even on the boilerplate corpus: the df
        // cap drops boilerplate fingerprints BEFORE the self-join
        Incremental.writeWinnowClusterState(state, "doc_id", col("text"), t)
      else if (isBp) {
        // a direct gram build over shared-boilerplate docs is the
        // quadratic batch shape this whole family exists to avoid
        // (Σ df² join rows ≈ 16·N² — infeasible past ~1×), so build
        // collision-free from the STRIPPED texts and overlay the
        // boilerplate postings the true build would have landed:
        // per state doc, the head/foot gram digests (df = corpus by
        // construction) with per-doc totals raised accordingly.
        // Membership/edges are IDENTICAL to a true boilerplate build
        // at t=0.4: boilerplate-only overlap is J ≈ 16/130 ≈ 0.12,
        // below threshold, so no pair decision changes — only the
        // posting df the APPEND fan-out (the term under test) sees.
        val statePlain = plain0.filter(col("doc_id") < w1Lo ||
          col("doc_id") >= 5000L)
        Incremental.writeClusterState(statePlain, "doc_id", col("text"),
          n, threshold, t)
        val bpDocs = state.select(col("doc_id"))
          .withColumn("text", explode(array(lit(bpHead), lit(bpFoot))))
        val bpPosts = Incremental.wavePostings(bpDocs, "doc_id",
          col("text"), n)
        val totals = spark.table(t.postTable).groupBy(col("doc_id"))
          .agg(max(col("n_grams")).as("__body"))
        bpPosts.join(totals, Seq("doc_id"), "left")
          .select(col("__g1").as("g1"), col("__g2").as("g2"),
            col("doc_id"),
            (col("n_grams") + coalesce(col("__body"), lit(0L)))
              .as("n_grams"))
          .repartition(t.numBuckets, col("g1"), col("g2"))
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .bucketBy(t.numBuckets, "g1", "g2").sortBy("g1", "g2")
          .saveAsTable(t.postTable)
      } else
        Incremental.writeClusterState(state, "doc_id", col("text"),
          n, threshold, t)
      val buildS = (System.nanoTime() - b0) / 1e9
      def probe(w: org.apache.spark.sql.DataFrame): Double = {
        val p0 = System.nanoTime()
        val assigned =
          if (mode == "winnow")
            Incremental.appendWinnowClusters(w, "doc_id", col("text"), t)
          else Incremental.appendClusters(w, "doc_id",
            col("text"), n, threshold, t)
        assigned.count()
        (System.nanoTime() - p0) / 1e9
      }
      val wallA = probe(waveA)
      val wallB = probe(waveB)
      // the recurring READ path with a takedown overlay live: patch
      // 10 state ids, then time full resolution (stored -> patch ->
      // alias -> tombstone filter)
      val rids = state.select(col("doc_id")).orderBy(col("doc_id"))
        .limit(10)
      val td0 = System.nanoTime()
      Incremental.patchTakedownClusters(spark, rids, t)
      val tdS = (System.nanoTime() - td0) / 1e9
      def resolveWall(): Double = {
        val r0 = System.nanoTime()
        Incremental.resolveClusters(spark, t).write
          .mode("overwrite").format("noop").save()
        (System.nanoTime() - r0) / 1e9
      }
      val res1 = resolveWall(); val res2 = resolveWall()
      println(f"[cscale] mode=$mode dir=$dir docs=$total stateDocs=${total - 2 * waveN} " +
        f"waveN=$waveN build=$buildS%.1f appendMin=${math.min(wallA, wallB)}%.2f " +
        f"(a=$wallA%.2f b=$wallB%.2f) takedown10=$tdS%.2f " +
        f"resolveMin=${math.min(res1, res2)}%.2f")
    }
    spark.stop()
  }
}
