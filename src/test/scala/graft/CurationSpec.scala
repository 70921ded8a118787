package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.Warehouse

/** End-to-end curation driver: gates → exact dedup → near-dup →
  * decontamination → split → gold + mixture card + suite + warehouse
  * rows, composed from the operators the per-stage oracles already
  * gate individually. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("curation run: funnel monotone, gold partitioned, eval decontaminated, gate green") {
    val base = Files.createTempDirectory("graft-curation").toString
    val whDir = Files.createTempDirectory("graft-curation-wh").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.write.mode("overwrite").parquet(s"$base/corpus")
    // eval set = a slice of the corpus itself → decontamination MUST
    // remove overlapping docs
    docs.filter(col("doc_id") % 25 === 0)
      .write.mode("overwrite").parquet(s"$base/eval")
    val tracker = new Warehouse.MetricsTracker(spark, whDir, "curation-test")

    val (funnel, results) = CurationCli.run(
      spark, s"$base/corpus", Some(s"$base/eval"), s"$base/out",
      GraftConfig(maxTextLength = 100000), Some(tracker))

    assert(funnel.input === docs.count())
    assert(funnel.input >= funnel.retracted &&
      funnel.retracted >= funnel.urlDeduped &&
      funnel.urlDeduped >= funnel.gated &&
      funnel.gated >= funnel.classified &&
      funnel.classified >= funnel.capped &&
      funnel.capped >= funnel.exact &&
      funnel.exact >= funnel.fuzzy && funnel.fuzzy >= funnel.novel &&
      funnel.novel >= funnel.decontaminated &&
      funnel.decontaminated === funnel.output,
      s"funnel must be monotone: $funnel")
    // no url column, no cap, no NB gate configured → those stages
    // pass through
    assert(funnel.urlDeduped === funnel.input)
    assert(funnel.classified === funnel.gated)
    assert(funnel.capped === funnel.gated)
    assert(funnel.fuzzy > funnel.decontaminated,
      "the self-overlapping eval set must remove documents")
    assert(funnel.exact < funnel.gated || funnel.fuzzy < funnel.exact,
      "the corpus's seeded duplicates must be removed somewhere")

    // gold is split-partitioned, mixture card exists
    val goldDirs = new java.io.File(s"$base/out/gold").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(goldDirs.nonEmpty && goldDirs.forall(_.startsWith("split=")))
    val mix = spark.read.parquet(s"$base/out/mixture")
    assert(mix.count() > 0)
    // release manifest ships alongside: per-split rows reconcile with gold
    val manifest = spark.read.parquet(s"$base/out/manifest")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(manifest.keySet === goldDirs.map(_.stripPrefix("split=")).toSet)
    assert(manifest.values.sum === funnel.output,
      s"manifest rows must reconcile with the release: $manifest")

    // suite green; warehouse carries the funnel
    assert(results.nonEmpty && operators.Quality.gate(results) === 0,
      results.filterNot(_.passed).map(_.name).mkString(","))
    Warehouse.register(spark, whDir)
    val metrics = spark.sql("SELECT metric_name, metric_value FROM quality_metrics")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(metrics("curation_input") === funnel.input.toDouble)
    assert(metrics("curation_output") === funnel.output.toDouble)
  }

  test("curation run: takedown stage retracts listed ids before any content work") {
    val base = Files.createTempDirectory("graft-curation-td").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.write.mode("overwrite").parquet(s"$base/corpus")
    docs.filter(col("doc_id") % 10 === 0).select("doc_id")
      .write.mode("overwrite").parquet(s"$base/takedown")

    val (funnel, _) = CurationCli.run(
      spark, s"$base/corpus", None, s"$base/out",
      GraftConfig(maxTextLength = 100000,
        takedownPath = Some(s"$base/takedown")))

    assert(funnel.retracted ===
      funnel.input - docs.filter(col("doc_id") % 10 === 0).count(),
      s"every listed id must be retracted: $funnel")
    // the opt-out guarantee holds in the released gold
    val gold = spark.read.parquet(s"$base/out/gold")
    assert(gold.filter(col("doc_id") % 10 === 0).count() === 0L,
      "a retracted document must never reach the release")
  }

  test("curation run: url dedup and source cap stages engage when configured") {
    val base = Files.createTempDirectory("graft-curation-url").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // every pair of doc_ids shares one canonical URL (tracking-param
    // variant), so URL dedup must halve the corpus before any content
    // work
    docs.withColumn("url",
        concat(lit("https://example.com/p/"),
          floor(col("doc_id") / 2).cast("long").cast("string"),
          when(col("doc_id") % 2 === 0, lit("")).otherwise(lit("?utm_source=x"))))
      .write.mode("overwrite").parquet(s"$base/corpus")

    val (funnel, _) = CurationCli.run(
      spark, s"$base/corpus", None, s"$base/out",
      GraftConfig(maxTextLength = 100000, sourceCap = 5L))

    assert(funnel.urlDeduped * 2 === funnel.input,
      s"paired URLs must halve the corpus: $funnel")
    assert(funnel.capped < funnel.gated,
      s"a cap of 5 per source must bite on ~25-doc sources: $funnel")
    // the cap holds in the released gold
    val gold = spark.read.parquet(s"$base/out/gold")
    val perSource = gold.groupBy("source").count()
      .collect().map(_.getLong(1))
    assert(perSource.forall(_ <= 5))
  }

  test("curation run: learned NB gate drops junk-vocabulary docs the rules pass") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-curation-nb").toString
    // per-doc-unique vocabularies so the downstream near-dup stages
    // keep all six (the gate under test is the classifier, not dedup)
    val good = (0L until 6L).map(i => (i,
      s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h", "en", "srcA"))
    // rule-fail negatives: over the length bound, junk vocabulary
    val junk = (10L until 14L).map(i => (i,
      ("spam buy now " * 20).trim, "en", "srcB"))
    // rule-PASS spam: in-bounds length, top-word share under the
    // Gopher bound, but junk vocabulary — only the classifier can
    // catch these
    val borderline = (20L until 22L).map(i => (i,
      "spam buy now spam buy now spam buy", "en", "srcB"))
    (good ++ junk ++ borderline)
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$base/corpus")

    val (funnel, _) = CurationCli.run(
      spark, s"$base/corpus", None, s"$base/out",
      GraftConfig(minTextLength = 10, maxTextLength = 100,
        nbMinScore = Some(0.0), minVolume = 1L))

    assert(funnel.gated === 8, s"rules drop only the long junk: $funnel")
    assert(funnel.classified === 6,
      s"the classifier must drop the two rule-passing spam docs: $funnel")
    val gold = spark.read.parquet(s"$base/out/gold")
    assert(gold.select("doc_id").as[Long].collect().toSet === (0L until 6L).toSet)
  }

  test("curation run: NB gate passes through on one-class labels") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-curation-nb1").toString
    (0L until 6L).map(i => (i, s"p${i}x p${i}y p${i}z p${i}w", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$base/corpus")
    val (funnel, _) = CurationCli.run(
      spark, s"$base/corpus", None, s"$base/out",
      GraftConfig(minTextLength = 3, maxTextLength = 1000,
        nbMinScore = Some(100.0)))
    assert(funnel.classified === funnel.gated,
      s"a one-class corpus must skip the NB gate, not empty the funnel: $funnel")
    assert(funnel.output === 6)
  }

  test("curation run: novelty floor drops the remix doc, keeps originals and short docs") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-curation-nov").toString
    // docs 0/1: original phrasing; doc 2: a remix of whole spans of
    // both (novelty 3/9 — only its boundary grams are new, yet it is
    // not a near-dup of either SINGLE doc); doc 3: too short for
    // grams (NULL novelty must pass). fuzzyThreshold raised so the
    // near-dup stage provably does not remove the remix first.
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en"),
      (1L, "one two three four five six seven eight", "en"),
      (2L, "alpha beta gamma delta epsilon zeta one two three four five six", "en"),
      (3L, "tiny doc", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$base/corpus")
    val (funnel, _) = CurationCli.run(
      spark, s"$base/corpus", None, s"$base/out",
      GraftConfig(minTextLength = 3, maxTextLength = 1000,
        fuzzyThreshold = 0.9, minNovelty = Some(0.5)))
    val gold = spark.read.parquet(s"$base/out/gold")
      .select("doc_id").as[Long].collect().toSet
    assert(funnel.fuzzy === 4, s"near-dup must not claim the remix: $funnel")
    assert(funnel.novel === 3, s"exactly the remix doc drops: $funnel")
    assert(gold === Set(0L, 1L, 3L))

    // floor unset → stage passes through
    val (noFloor, _) = CurationCli.run(
      spark, s"$base/corpus", None, s"$base/out2",
      GraftConfig(minTextLength = 3, maxTextLength = 1000,
        fuzzyThreshold = 0.9))
    assert(noFloor.novel === noFloor.fuzzy)
  }
}
