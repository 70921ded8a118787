package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Classifier, Dedup, Quality, Split, Stats}
import graft.warehouse.Warehouse

/** Operational entrypoint for the TRAINING-DATA curation pipeline —
  * the beyond-reference driver composing the engine's LLM-data
  * operators end to end over a parquet corpus:
  *
  *   takedown enforcement (GRAFT_TAKEDOWN set — retract opted-out
  *     ids before any content work) →
  *   URL-level dedup (when the corpus carries a `url` column —
  *     canonicalize, keep lowest id; the cheapest dedup runs first) →
  *   quality gates (length bounds + Gopher repetition) →
  *   learned NB quality gate (GRAFT_NB_MIN_SCORE set — rule outcomes
  *     label a self-trained token classifier, map-side scoring) →
  *   per-source cap (GRAFT_SOURCE_CAP > 0 and a `source` column —
  *     the RefinedWeb domain cap, skew-proof two-stage) →
  *   exact dedup (normalized-text digest, keep lowest id) →
  *   banded MinHash near-dup removal →
  *   in-corpus novelty floor (GRAFT_MIN_NOVELTY set — drop
  *     templated/remix docs below the distinct-gram novelty floor) →
  *   eval-set decontamination (optional, guarded jaccard join) →
  *   seeded leakage-free split →
  *   gold parquet partitioned by split + data-mixture card →
  *   output quality suite → run/metrics/lineage in the warehouse.
  *
  * Knobs come from [[GraftConfig]] (GRAFT_* env vars). Exit code is
  * the output suite's composite gate ([[Quality.gateCode]] semantics,
  * 0 = all checks pass). Every stage count rides an `observe`-free
  * cheap count on the materialized parquet layers, so the printed
  * funnel is exact.
  *
  * Usage:
  *   runMain graft.CurationCli <corpusParquet> <evalParquet|-> <outDir> <warehouseDir>
  */
object CurationCli {

  final case class Funnel(
      input: Long, retracted: Long, urlDeduped: Long, gated: Long,
      classified: Long, capped: Long, exact: Long, fuzzy: Long, novel: Long,
      decontaminated: Long, output: Long)

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: CurationCli <corpusParquet> <evalParquet|-> <outDir> <warehouseDir>")
    val Array(corpusPath, evalPath, outDir, warehouseDir) = args.take(4)
    val spark = GraftSession.get(
      s"local[${Runtime.getRuntime.availableProcessors()}]")
    val tracker = new Warehouse.MetricsTracker(spark, warehouseDir, "curation")
    try {
      val (funnel, results) = run(spark, corpusPath,
        Option(evalPath).filter(p => p.nonEmpty && p != "-"),
        outDir, GraftConfig.fromEnv(), Some(tracker))
      println(s"[curation] input=${funnel.input} " +
        s"retracted=${funnel.retracted} url=${funnel.urlDeduped} " +
        s"gated=${funnel.gated} classified=${funnel.classified} " +
        s"capped=${funnel.capped} " +
        s"exact=${funnel.exact} fuzzy=${funnel.fuzzy} " +
        s"novel=${funnel.novel} " +
        s"decontaminated=${funnel.decontaminated} output=${funnel.output}")
      results.foreach(r =>
        println(f"[quality] ${r.name}%-24s observed=${r.observed}%.4f passed=${r.passed}"))
      val code = Quality.gateCode(results)
      if (code != 0)
        System.err.println(s"[curation] FAILED checks: " +
          Quality.failedChecks(results).mkString(", "))
      spark.stop()
      sys.exit(if (code == 0) 0 else 1)
    } catch {
      case e: Throwable =>
        tracker.fail(e.getMessage)
        throw e
    }
  }

  /** The composed pipeline, callable from tests. The corpus must carry
    * (doc_id: long, text: string, lang: string); extra columns pass
    * through to gold. */
  def run(
      spark: SparkSession,
      corpusPath: String,
      evalPath: Option[String],
      outDir: String,
      cfg: GraftConfig = GraftConfig(),
      tracker: Option[Warehouse.MetricsTracker] = None)
      : (Funnel, Seq[Quality.CheckResult]) = {
    val raw = spark.read.parquet(corpusPath)
    val input = raw.count()

    // -1. takedown enforcement FIRST (GRAFT_TAKEDOWN = parquet of
    // retracted doc_ids): opt-out and legal-removal requests are
    // honored before any content work, so a retracted document can
    // never influence dedup survivors, classifier training, or the
    // gold output. Broadcast anti-join — the takedown list is
    // request-sized, the corpus side never shuffles. Derived state
    // tables get the same treatment via Incremental.retractIds /
    // compactState at their own cadence.
    val corpus = cfg.takedownPath match {
      case Some(pth) => graft.operators.Incremental.retractIds(
        raw, "doc_id",
        spark.read.parquet(pth).select(col("doc_id").as("retract_id")))
      case None => raw
    }
    val nRetracted = if (cfg.takedownPath.isDefined) corpus.count() else input

    // 0. URL-level dedup when provenance is present — two fetches of
    // one page are duplicates before any content work, and the
    // canonical-URL window is the cheapest dedup in the funnel
    val urlDeduped =
      if (corpus.columns.contains("url"))
        Dedup.keepBestWindow(
          corpus.withColumn("__curl",
            graft.functions.analysis.canonicalize_url(col("url"))),
          col("__curl"), Seq(col("doc_id").asc)).drop("__curl")
      else corpus
    val nUrl = if (corpus.columns.contains("url")) urlDeduped.count() else input

    // 1. quality gates — length bounds + Gopher top-word share, the
    // map-side filters every curation run starts with
    val rep = Stats.wordRepetition(urlDeduped, "doc_id", col("text"))
      .select(col("doc_id"), col("top_word_frac"))
    val gated = urlDeduped
      .filter(length(col("text")).between(cfg.minTextLength, cfg.maxTextLength))
      .join(rep, Seq("doc_id"), "left")
      .filter(col("top_word_frac").isNull || col("top_word_frac") <= 0.8)
      .drop("top_word_frac")
    val nGated = gated.count()

    // 1.25. learned quality gate (GRAFT_NB_MIN_SCORE set — the CCNet
    // shape: cheap rule outcomes on the PRE-gate corpus label a
    // self-trained NB token classifier, and the classifier's smoothed
    // log-odds score gates the rule-passed survivors, catching
    // junk-vocabulary docs the rules can't see). Map-side scoring:
    // the dictionary rides as referenced arrays, zero extra shuffles.
    // A one-class corpus has no ratio to learn (prior degenerates to
    // ±Inf/NaN) — the stage then passes through untouched.
    val (classified, nClassified) = cfg.nbMinScore match {
      case Some(min) =>
        val label =
          length(col("text")).between(cfg.minTextLength, cfg.maxTextLength)
        val prior = Classifier.collectPrior(urlDeduped, label)
        if (!java.lang.Double.isFinite(prior)) {
          System.err.println("[curation] NB gate skipped: one-class labels " +
            "(every doc on the same side of the length rule)")
          (gated, nGated) // skip = pass-through; nGated is already counted
        } else {
          val (keys, weights) = Classifier.collectDict(
            Classifier.nbTrain(urlDeduped, col("text"), label))
          val f = gated.filter(round(
            Classifier.nbScoreColumn(col("text"), keys, weights, prior), 4) >= min)
          (f, f.count())
        }
      case None => (gated, nGated)
    }

    // 1.5. per-source cap (RefinedWeb domain cap) — bounded, skew-proof
    val capped =
      if (cfg.sourceCap > 0 && classified.columns.contains("source"))
        // saturate, never truncate: a Long cap past Int.MaxValue must
        // mean "effectively uncapped", not a wrapped small number
        Split.capPerStratum(classified, col("source"), col("doc_id"),
          cap = math.min(cfg.sourceCap, Int.MaxValue.toLong).toInt,
          seed = cfg.seed)
      else classified
    val nCapped =
      if (cfg.sourceCap > 0 && classified.columns.contains("source"))
        capped.count()
      else nClassified

    // 2. exact dedup: keep the lowest id per normalized text
    val exact = Dedup.keepBestWindow(capped,
      graft.functions.text.norm_key(col("text")), Seq(col("doc_id").asc))
    val nExact = exact.count()

    // 3. near-dup removal (banded MinHash, the scale path)
    val fuzzy = Dedup.minhashDedup(exact, "doc_id", col("text"),
      threshold = cfg.fuzzyThreshold)
    val nFuzzy = fuzzy.count()

    // 3.5. in-corpus novelty floor (GRAFT_MIN_NOVELTY set): after
    // near-dup removal, drop documents whose distinct-gram novelty
    // under the id scan order sits below the floor — templated/remix
    // content not similar enough to any SINGLE earlier doc to dedup,
    // yet contributing almost no phrasing the corpus lacks. NULL
    // novelty (fewer than n words) passes: unprovable, the gate
    // convention everywhere else in the engine.
    val (novel, nNovel) = cfg.minNovelty match {
      case Some(min) =>
        // internal __-alias: a corpus legitimately carrying its own
        // `novelty` column (extra columns pass through to gold) must
        // not make the join ambiguous
        val nov = Stats.ngramNovelty(fuzzy, "doc_id", col("text"))
          .select(col("doc_id"), col("novelty").as("__nov"))
        val f = fuzzy.join(nov, Seq("doc_id"), "left")
          .filter(col("__nov").isNull || col("__nov") >= min)
          .drop("__nov")
        (f, f.count())
      case None => (fuzzy, nFuzzy)
    }

    // 4. decontamination against the eval set (guarded join — routes
    // to banded candidates when the eval side is oversized)
    val decon = evalPath match {
      case Some(p) =>
        val eval = spark.read.parquet(p)
          .select(col("doc_id").as("eval_id"), col("text").as("eval_text"))
        Dedup.decontaminate(novel, "doc_id", col("text"),
          eval, "eval_id", col("eval_text"), t = 0.8, n = 5)
      case None => novel
    }
    val nDecon = decon.count()

    // 5. LEAKAGE-SAFE seeded split → gold parquet partitioned by
    // split. Near-dups above fuzzyThreshold are already gone (step 3),
    // but pairs just BELOW it survive dedup and a per-row split would
    // let a training doc's near-duplicate land in test — the
    // contamination that inflates eval numbers. SimHash pairs (one
    // signature pass, Hamming ≤ 3) move such clusters as a unit;
    // isolated docs (the overwhelming majority) get labels identical
    // to the plain per-row split.
    val nearPairs = Dedup.simhashPairs(decon, "doc_id", col("text"))
    val gold = Split.leakageSafeSplit(decon, "doc_id", nearPairs,
      cfg.seed, cfg.normalizedRatios)
    gold.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/gold")
    val goldBack = spark.read.parquet(s"$outDir/gold")
    val output = goldBack.count()

    // 6. data-mixture card + release manifest alongside the release
    // (per-split files/bytes/rows — the integrity artifact a consumer
    // verifies their download against; per-file SHA-256 via
    // CorpusIO.fileManifest when they need it)
    Stats.mixtureReport(goldBack, Seq(col("lang"), col("split")),
        cost = length(col("text")))
      .write.mode("overwrite").parquet(s"$outDir/mixture")
    sources.CorpusIO.releaseManifest(spark, s"$outDir/gold", "split")
      .write.mode("overwrite").parquet(s"$outDir/manifest")

    // 7. output suite: structural gates on the released corpus
    val results = Quality.run(goldBack, Seq(
      Quality.NotNullCheck("text", 1.0),
      Quality.UniquenessCheck("doc_id", 1.0),
      Quality.RowCountCheck(cfg.minVolume, cfg.maxVolume),
      Quality.RangeCheck("text_length", length(col("text")),
        cfg.minTextLength.toDouble, cfg.maxTextLength.toDouble, 1.0),
      Quality.MembershipCheck("split",
        Seq("train", "validation", "test"), 1.0)))

    val funnel = Funnel(input, nRetracted, nUrl, nGated, nClassified,
      nCapped, nExact, nFuzzy, nNovel, nDecon, output)
    tracker.foreach { t =>
      t.lineage(corpusPath, "parquet", "input", input, nGated)
      t.lineage(s"$outDir/gold", "parquet", "gold", nDecon, output)
      t.metric("curation_input", input.toDouble)
      t.metric("curation_retracted", nRetracted.toDouble)
      t.metric("curation_url_deduped", nUrl.toDouble)
      t.metric("curation_gated", nGated.toDouble)
      t.metric("curation_classified", nClassified.toDouble)
      t.metric("curation_capped", nCapped.toDouble)
      t.metric("curation_exact", nExact.toDouble)
      t.metric("curation_fuzzy", nFuzzy.toDouble)
      t.metric("curation_novel", nNovel.toDouble)
      t.metric("curation_decontaminated", nDecon.toDouble)
      t.metric("curation_output", output.toDouble)
      results.foreach(r => t.metric(r.name, r.observed, "rate"))
      t.complete(input, output)
    }
    (funnel, results)
  }
}
