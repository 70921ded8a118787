package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality
import graft.warehouse.Warehouse

/** Operational entrypoint replicating the reference's
  * `python -m src.pipeline.cli run` (SURVEY §3.1) end to end:
  * read silver/diamond globs → unify (normalize, validity, dedup-best,
  * seeded split) → gold JSONL → quality gate → run record + metrics in
  * the metadata warehouse. Exit code is the quality gate's.
  *
  * Usage:
  *   runMain graft.UnifyCli <silverGlob> <diamondGlob> <goldDir> <warehouseDir> [seed]
  * (empty string for a glob skips that layer)
  */
object UnifyCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: UnifyCli <silverGlob> <diamondGlob> <goldDir> <warehouseDir> [seed]")
    val Array(silverGlob, diamondGlob, goldDir, warehouseDir) = args.take(4)
    // validated settings from GRAFT_* env vars (the reference's
    // CORC_NAH_* pydantic Settings); an explicit seed arg wins
    val cfg = GraftConfig.fromEnv()
    val seed = if (args.length > 4) args(4).toLong else cfg.seed

    val spark = GraftSession.get(
      s"local[${Runtime.getRuntime.availableProcessors()}]")
    val tracker = new Warehouse.MetricsTracker(spark, warehouseDir, "unify")
    try {
      val stats = UnifyPipeline.run(
        spark,
        if (silverGlob.nonEmpty) Seq(silverGlob) else Nil,
        if (diamondGlob.nonEmpty) Seq(diamondGlob) else Nil,
        goldDir, seed, cfg.normalizedRatios)

      val gold = spark.read.json(goldDir)
      // volume bounds default to 1-10M here; production sets
      // GRAFT_MIN_VOLUME=100000 to pin the GE suite's 100k-10M
      val results = Quality.run(gold,
        Quality.corpusSuite(minVolume = cfg.minVolume, maxVolume = cfg.maxVolume))
      results.foreach(r => tracker.metric(r.name, r.observed, "rate"))
      tracker.metric("records_output", stats.deduped.toDouble)
      tracker.metric("records_malformed", stats.malformed.toDouble)
      // one data_lineage row per source file: lines attempted, lines
      // parsed, malformed difference (unify.py:174-213 accounting)
      stats.sources.foreach(src =>
        tracker.lineage(src.file, "jsonl", src.layer, src.lines, src.parsed))
      tracker.complete(stats.input, stats.deduped)

      results.foreach(r =>
        println(f"[quality] ${r.name}%-20s observed=${r.observed}%.4f passed=${r.passed}"))
      println(s"[unify] input=${stats.input} valid=${stats.valid} deduped=${stats.deduped} " +
        s"malformed=${stats.malformed} " +
        s"train=${stats.train} validation=${stats.validation} test=${stats.test}")
      // composite gate: the exit code's BITS identify the failed
      // checks (bit i = check i of the suite); the names print too,
      // since POSIX truncates the status to 8 bits
      val code = Quality.gateCode(results)
      if (code != 0L)
        println(s"[quality] gate failed code=$code " +
          s"checks=${Quality.failedChecks(results).mkString(",")}")
      spark.stop()
      if (code != 0L) sys.exit((code & 0x7f).toInt.max(1))
    } catch {
      case e: Exception =>
        tracker.fail(e.getMessage)
        spark.stop()
        throw e
    }
  }
}
