package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Validated settings layer (reference: src/utils/config.py:23-241 —
  * pydantic Settings with the ratio-sum and form validators, CORC_NAH_*
  * env overrides). */
class GraftConfigSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("defaults validate and mirror the reference's 90/5/5") {
    val cfg = GraftConfig().validated
    assert(cfg.ratios === Seq("train" -> 0.9, "validation" -> 0.05, "test" -> 0.05))
    assert(math.abs(cfg.normalizedRatios.map(_._2).sum - 1.0) < 1e-12)
  }

  test("ratio-sum validator: far-off sums throw, reference ±0.01 tolerance passes") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig(trainRatio = 0.5, valRatio = 0.3, testRatio = 0.1).validated
    }
    assert(e.getMessage.contains("sum to 1.0"))
    // 0.999 is inside the reference's 0.99..1.01 window …
    val near = GraftConfig(trainRatio = 0.9, valRatio = 0.05, testRatio = 0.049).validated
    // … and normalizedRatios re-scales it to the exact-sum form
    // Split.assign's 1e-9 require accepts
    assert(math.abs(near.normalizedRatios.map(_._2).sum - 1.0) < 1e-12)
    import spark.implicits._
    val df = Seq("a", "b", "c").toDF("k")
      .select(operators.Split.assign(col("k"), near.seed, near.normalizedRatios).as("s"))
    assert(df.collect().map(_.getString(0)).forall(
      Set("train", "validation", "test")))
  }

  test("bound validators name the offending field") {
    assert(intercept[IllegalArgumentException] {
      GraftConfig(minTextLength = 0).validated
    }.getMessage.contains("minTextLength"))
    assert(intercept[IllegalArgumentException] {
      GraftConfig(minTextLength = 50, maxTextLength = 10).validated
    }.getMessage.contains("maxTextLength"))
    assert(intercept[IllegalArgumentException] {
      GraftConfig(maxNullRate = 1.5).validated
    }.getMessage.contains("maxNullRate"))
    assert(intercept[IllegalArgumentException] {
      GraftConfig(fuzzyThreshold = 0.0).validated
    }.getMessage.contains("fuzzyThreshold"))
    assert(intercept[IllegalArgumentException] {
      GraftConfig(minVolume = 10, maxVolume = 5).validated
    }.getMessage.contains("minVolume"))
  }

  test("unicode form validator: unknown forms and non-NFC forms rejected") {
    assert(intercept[IllegalArgumentException] {
      GraftConfig(unicodeNormalization = "NFX").validated
    }.getMessage.contains("invalid normalization form"))
    assert(intercept[IllegalArgumentException] {
      GraftConfig(unicodeNormalization = "NFD").validated
    }.getMessage.contains("NFC-only"))
  }

  test("fromEnv: GRAFT_* overrides parse, malformed values name the variable") {
    val cfg = GraftConfig.fromEnv(Map(
      "GRAFT_SEED" -> "7", "GRAFT_TRAIN_RATIO" -> "0.8",
      "GRAFT_VAL_RATIO" -> "0.1", "GRAFT_TEST_RATIO" -> "0.1",
      "GRAFT_MIN_VOLUME" -> "100000", "GRAFT_SOURCE_CAP" -> "250"))
    assert(cfg.seed === 7L && cfg.trainRatio === 0.8 && cfg.minVolume === 100000L)
    assert(cfg.sourceCap === 250L)
    assert(intercept[IllegalArgumentException] {
      GraftConfig(sourceCap = -1L).validated
    }.getMessage.contains("sourceCap"))
    // unrelated env keys ignored
    assert(GraftConfig.fromEnv(Map("PATH" -> "/usr/bin")).seed === 42L)
    val e = intercept[IllegalArgumentException] {
      GraftConfig.fromEnv(Map("GRAFT_SEED" -> "not-a-number"))
    }
    assert(e.getMessage.contains("GRAFT_SEED"))
    // env values that parse but fail validation still throw
    assert(intercept[IllegalArgumentException] {
      GraftConfig.fromEnv(Map("GRAFT_TRAIN_RATIO" -> "0.2"))
    }.getMessage.contains("sum to 1.0"))
  }

  test("custom ratios thread through unify: only configured names appear") {
    import spark.implicits._
    val cfg = GraftConfig(trainRatio = 0.5, valRatio = 0.25, testRatio = 0.25).validated
    val layer = (1 to 200).map(i => (s"es $i", s"nah $i")).toDF("es", "nah")
      .withColumn("myn", lit(null).cast("string"))
      .withColumn("source", lit("t")).withColumn("layer", lit("silver"))
      .withColumn("origin_file", lit("f")).withColumn("category", lit(null).cast("string"))
    val out = UnifyPipeline.unify(Seq(layer), cfg.seed, cfg.normalizedRatios)
    val bySplit = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "validation", "test")))
    // 50/25/25 should be roughly respected at n=200 (hash-uniform)
    assert(bySplit("train") > bySplit("validation"))
    assert(bySplit("train") > bySplit("test"))
  }
}
