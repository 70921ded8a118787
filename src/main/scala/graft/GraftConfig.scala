package graft

/** Validated pipeline settings, the engine's counterpart of the
  * reference's pydantic `Settings`
  * (/root/reference/src/utils/config.py:23-241): split ratios with the
  * sum-to-one validator, text-length bounds, quality-gate rates, the
  * Unicode normalization form, and env-var overrides under a `GRAFT_`
  * prefix (the reference uses `CORC_NAH_`).
  *
  * Operators keep their constructor defaults — this object is the ONE
  * place an operator-spanning run (UnifyCli, MedallionPipeline) pulls
  * its knobs from, so a deployment overrides `GRAFT_TRAIN_RATIO` once
  * instead of editing call sites. `validated` throws
  * `IllegalArgumentException` naming the offending field, matching the
  * reference's field_validator behavior.
  */
final case class GraftConfig(
    seed: Long = 42L,
    trainRatio: Double = 0.9,
    valRatio: Double = 0.05,
    testRatio: Double = 0.05,
    minTextLength: Int = 3,
    maxTextLength: Int = 1000,
    maxDuplicateRate: Double = 0.05,
    maxNullRate: Double = 0.10,
    fuzzyThreshold: Double = 0.5,
    unicodeNormalization: String = "NFC",
    minVolume: Long = 1L,
    maxVolume: Long = 10000000L,
    sourceCap: Long = 0L,
    nbMinScore: Option[Double] = None,
    minNovelty: Option[Double] = None,
    takedownPath: Option[String] = None) {

  /** Split ratios in pipeline order. The reference validator accepts a
    * sum within ±0.01 of 1.0 (config.py:236-241); [[Split.assign]]
    * demands 1e-9, so consumers use [[normalizedRatios]]. */
  def ratios: Seq[(String, Double)] =
    Seq("train" -> trainRatio, "validation" -> valRatio, "test" -> testRatio)

  /** Ratios rescaled to sum to exactly 1.0 — the validated-tolerance
    * form [[Split.assign]] accepts. */
  def normalizedRatios: Seq[(String, Double)] = {
    val s = ratios.map(_._2).sum
    ratios.map { case (n, r) => n -> r / s }
  }

  /** Fail-fast validation; returns `this` so construction sites can
    * chain (`GraftConfig(...).validated`). */
  def validated: GraftConfig = {
    def inUnit(name: String, v: Double): Unit =
      require(v >= 0.0 && v <= 1.0, s"$name must be in [0, 1], got $v")
    inUnit("trainRatio", trainRatio)
    inUnit("valRatio", valRatio)
    inUnit("testRatio", testRatio)
    val sum = trainRatio + valRatio + testRatio
    require(sum >= 0.99 && sum <= 1.01,
      f"split ratios must sum to 1.0 (±0.01), got $sum%.3f")
    require(minTextLength > 0, s"minTextLength must be > 0, got $minTextLength")
    require(maxTextLength > minTextLength,
      s"maxTextLength ($maxTextLength) must exceed minTextLength ($minTextLength)")
    inUnit("maxDuplicateRate", maxDuplicateRate)
    inUnit("maxNullRate", maxNullRate)
    require(fuzzyThreshold > 0.0 && fuzzyThreshold <= 1.0,
      s"fuzzyThreshold must be in (0, 1], got $fuzzyThreshold")
    val forms = Seq("NFC", "NFD", "NFKC", "NFKD")
    require(forms.contains(unicodeNormalization),
      s"invalid normalization form '$unicodeNormalization', must be one of $forms")
    require(unicodeNormalization == "NFC",
      "the engine's native normalization kernel is NFC-only (the reference's " +
        "default and the form that preserves macrons); set GRAFT_UNICODE_NORM=NFC")
    require(minVolume >= 0 && maxVolume >= minVolume,
      s"volume bounds must satisfy 0 <= minVolume <= maxVolume, " +
        s"got [$minVolume, $maxVolume]")
    require(sourceCap >= 0, s"sourceCap must be >= 0 (0 = off), got $sourceCap")
    nbMinScore.foreach(m => require(!m.isNaN && !m.isInfinite,
      "nbMinScore must be a finite log-odds threshold (unset GRAFT_NB_MIN_SCORE " +
        "to disable): +Inf silently empties the corpus, -Inf gates nothing"))
    minNovelty.foreach(m => require(m >= 0.0 && m <= 1.0,
      s"minNovelty is a fraction in [0, 1] (unset GRAFT_MIN_NOVELTY to " +
        s"disable), got $m"))
    takedownPath.foreach(pth => require(pth.trim.nonEmpty,
      "takedownPath must be a parquet path of retracted ids (unset " +
        "GRAFT_TAKEDOWN to disable)"))
    this
  }
}

object GraftConfig {
  val EnvPrefix = "GRAFT_"

  /** Settings from environment variables (`GRAFT_SEED`,
    * `GRAFT_TRAIN_RATIO`, ... — the reference's `CORC_NAH_*` pattern),
    * validated. A malformed value fails fast naming the variable. */
  def fromEnv(env: Map[String, String] = sys.env): GraftConfig = {
    def parse[A](suffix: String, cast: String => A, orElse: A): A =
      env.get(EnvPrefix + suffix).map { raw =>
        try cast(raw)
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$EnvPrefix$suffix: cannot parse '$raw'")
        }
      }.getOrElse(orElse)
    val d = GraftConfig()
    GraftConfig(
      seed = parse("SEED", _.toLong, d.seed),
      trainRatio = parse("TRAIN_RATIO", _.toDouble, d.trainRatio),
      valRatio = parse("VAL_RATIO", _.toDouble, d.valRatio),
      testRatio = parse("TEST_RATIO", _.toDouble, d.testRatio),
      minTextLength = parse("MIN_TEXT_LENGTH", _.toInt, d.minTextLength),
      maxTextLength = parse("MAX_TEXT_LENGTH", _.toInt, d.maxTextLength),
      maxDuplicateRate = parse("MAX_DUPLICATE_RATE", _.toDouble, d.maxDuplicateRate),
      maxNullRate = parse("MAX_NULL_RATE", _.toDouble, d.maxNullRate),
      fuzzyThreshold = parse("FUZZY_THRESHOLD", _.toDouble, d.fuzzyThreshold),
      unicodeNormalization = parse("UNICODE_NORM", identity, d.unicodeNormalization),
      minVolume = parse("MIN_VOLUME", _.toLong, d.minVolume),
      maxVolume = parse("MAX_VOLUME", _.toLong, d.maxVolume),
      sourceCap = parse("SOURCE_CAP", _.toLong, d.sourceCap),
      nbMinScore = parse("NB_MIN_SCORE", s => Some(s.toDouble), d.nbMinScore),
      minNovelty = parse("MIN_NOVELTY", s => Some(s.toDouble), d.minNovelty),
      takedownPath = parse("TAKEDOWN", s => Some(s), d.takedownPath))
      .validated
  }
}
