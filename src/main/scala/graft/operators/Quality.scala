package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Single-pass data-quality framework (SURVEY §2.11, §5.4).
  *
  * The reference has a Scala `QualityCheck` trait whose checks each
  * re-scan the frame (/root/reference/src/scala_examples/
  * DataQuality.scala:20-114) plus a Great Expectations suite
  * (great_expectations/expectations/corc_nah_corpus_suite.json).
  * Here every check compiles to one aggregate `Column`, the whole
  * suite evaluates in ONE scan (`df.agg(...)`), and the pass/fail
  * gate is computed from the single result row — at 100 TB this is
  * the difference between one read and N reads.
  */
object Quality {

  sealed trait QualityCheck {
    def name: String
    /** Aggregate expression producing the observed metric. */
    def metric: Column
    /** Predicate over the observed value. */
    def passes(observed: Double): Boolean
  }

  /** Fraction of non-null values ≥ threshold. */
  final case class NotNullCheck(column: String, minRate: Double) extends QualityCheck {
    val name = s"not_null_$column"
    def metric: Column = count(col(column)).cast("double") / count(lit(1))
    def passes(o: Double): Boolean = o >= minRate
  }

  /** Fraction of rows matching regex ≥ threshold (nulls fail the regex). */
  final case class RegexCheck(column: String, pattern: String, minRate: Double) extends QualityCheck {
    val name = s"regex_$column"
    def metric: Column =
      sum(when(col(column).rlike(pattern), 1).otherwise(0)).cast("double") / count(lit(1))
    def passes(o: Double): Boolean = o >= minRate
  }

  /** Distinct ratio within [min,max]. */
  final case class UniquenessCheck(column: String, minRate: Double, maxRate: Double = 1.0) extends QualityCheck {
    val name = s"unique_$column"
    def metric: Column = count_distinct(col(column)).cast("double") / count(col(column))
    def passes(o: Double): Boolean = o >= minRate && o <= maxRate
  }

  /** Row count within [min,max]. */
  final case class RowCountCheck(min: Long, max: Long = Long.MaxValue) extends QualityCheck {
    val name = "row_count"
    def metric: Column = count(lit(1)).cast("double")
    def passes(o: Double): Boolean = o >= min && o <= max
  }

  /** Fraction of values within [lo,hi] ≥ threshold (on an expression,
    * e.g. `length(col)`). */
  final case class RangeCheck(name: String, expr: Column, lo: Double, hi: Double, minRate: Double) extends QualityCheck {
    def metric: Column =
      sum(when(expr.between(lo, hi), 1).otherwise(0)).cast("double") / count(lit(1))
    def passes(o: Double): Boolean = o >= minRate
  }

  /** Fraction of NON-NULL values in the allowed set ≥ `minRate` —
    * exactly GE's `expect_column_values_to_be_in_set` semantics:
    * nulls are excluded from BOTH numerator and denominator (they
    * neither pass nor fail; `expect_column_values_to_not_be_null` is
    * the null gate). The earlier formulation counted nulls as
    * successes over a total-row denominator, which at `minRate < 1`
    * could pass a column GE fails (700 nulls + 300 all-out-of-set =
    * 0.7 ≥ 0.6 engine-pass vs GE's 0/300). An all-null column has no
    * in-set evidence either way → metric 1.0 (vacuous pass, as GE). */
  final case class MembershipCheck(column: String, allowed: Seq[String],
      minRate: Double = 1.0) extends QualityCheck {
    val name = s"member_$column"
    def metric: Column = coalesce(
      sum(when(col(column).isNull, 0)
          .when(col(column).isin(allowed.map(a => a: Any): _*), 1)
          .otherwise(0)).cast("double") /
        sum(when(col(column).isNull, 0).otherwise(1)),
      lit(1.0))
    def passes(o: Double): Boolean = o >= minRate
  }

  /** Table-structure check: the frame's column set must equal exactly
    * this set (GE `expect_table_columns_to_match_set`). Structural —
    * [[run]] evaluates it against the schema on the driver, no scan. */
  final case class ColumnSetCheck(columns: Set[String]) extends QualityCheck {
    val name = "column_set"
    def metric: Column = lit(1.0) // placeholder; run() special-cases
    def passes(o: Double): Boolean = o >= 1.0
  }

  /** C4-style line-and-page rules (the cleaning pass of "Exploring the
    * Limits of Transfer Learning" §2.2, parameterized): per LINE, keep
    * only lines with ≥ `minWordsPerLine` words that end in terminal
    * punctuation and contain no `lineBlacklist` term; per PAGE, drop
    * documents containing any `docBlacklist` term (lorem-ipsum
    * placeholder text, code-like `{`) or retaining fewer than
    * `minKeptLines` lines after the line pass. The text column is
    * rewritten to the kept lines (original order, `sep`-joined).
    *
    * Entirely a pure-Column composition — one `filter` HOF over the
    * split line array plus scalar predicates, so the whole gate runs
    * inline with the scan: no shuffle, no explode, no join. At 100 TB
    * this is the shape you want for a pass that touches every byte
    * once and only narrows. */
  def c4LineRules(df: DataFrame, textCol: String,
      minWordsPerLine: Int = 5, minKeptLines: Int = 3,
      lineBlacklist: Seq[String] = Seq("javascript"),
      docBlacklist: Seq[String] = Seq("lorem ipsum", "{"),
      sep: String = "\n"): DataFrame = {
    require(minWordsPerLine >= 1 && minKeptLines >= 0, "thresholds must be non-negative")
    val keepLine: Column => Column = l => {
      val words = size(split(trim(l), "\\s+")) >= minWordsPerLine && length(trim(l)) > 0
      val punct = l.rlike("[.!?\"]\\s*$")
      val clean = lineBlacklist.map(b => !contains(lower(l), lit(b.toLowerCase)))
        .foldLeft(lit(true))(_ && _)
      words && punct && clean
    }
    val docClean = docBlacklist.map(b => !contains(lower(col(textCol)), lit(b.toLowerCase)))
      .foldLeft(lit(true))(_ && _)
    df.filter(docClean)
      .withColumn("__kept",
        filter(split(col(textCol), java.util.regex.Pattern.quote(sep)), keepLine))
      .filter(size(col("__kept")) >= minKeptLines)
      .withColumn(textCol, array_join(col("__kept"), sep))
      .drop("__kept")
  }

  /** Relative (percentile) quality gate — keep the top `keepFrac` of
    * every stratum by `metric`, the FineWeb/DCLM-style selection rule:
    * absolute thresholds tuned on one domain misfire on another (a
    * "short" legal document is a long tweet), so production curation
    * keeps the best X% WITHIN each language/domain instead. Exact
    * count semantics: stratum g of n_g rows keeps the
    * `ceil(keepFrac·n_g)` best, ranked by metric desc with
    * deterministic tie-breaks — every stratum keeps at least one row,
    * the ±1-exact analog of [[graft.operators.Split.stratified]].
    * The product is rounded before the ceil so an IEEE artifact like
    * 0.4·35 = 14.000000000000002 can't inflate the quota.
    *
    * Scale shape: one window shuffle on the stratum (rank + stratum
    * count in the same window pass). Strata must be bounded-size
    * units (language, domain, source); for an unbounded stratum swap
    * in an `approx_percentile` threshold + narrow filter — contract
    * unchanged, exactness traded for no total order. */
  def relativeFilter(df: DataFrame, metric: Column, strata: Column,
      keepFrac: Double, tieBreak: Seq[Column]): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, "keepFrac must be in (0, 1]")
    val byStratum = org.apache.spark.sql.expressions.Window.partitionBy(strata)
    val rankW = byStratum.orderBy(metric.desc +: tieBreak.map(_.asc): _*)
    df.withColumn("__rk", row_number().over(rankW))
      .withColumn("__n", count(lit(1)).over(byStratum))
      .filter(col("__rk") <= ceil(round(col("__n") * keepFrac, 6)))
      .drop("__rk", "__n")
  }

  final case class CheckResult(name: String, observed: Double, passed: Boolean)

  /** Evaluate the whole suite in a single aggregation pass (structural
    * checks — [[ColumnSetCheck]] — are decided from the schema on the
    * driver, off the scan). */
  def run(df: DataFrame, checks: Seq[QualityCheck]): Seq[CheckResult] = {
    require(checks.nonEmpty, "empty check suite")
    val structural: Map[Int, CheckResult] = checks.zipWithIndex.collect {
      case (c: ColumnSetCheck, i) =>
        val ok = df.columns.toSet == c.columns
        i -> CheckResult(c.name, if (ok) 1.0 else 0.0, ok)
    }.toMap
    val aggChecks = checks.zipWithIndex.filterNot(p => structural.contains(p._2))
    val fromRow: Map[Int, CheckResult] =
      if (aggChecks.isEmpty) Map.empty
      else {
        val aggs = aggChecks.map { case (c, _) => c.metric.cast("double").as(c.name) }
        val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
        aggChecks.zipWithIndex.map { case ((c, origIdx), j) =>
          val v = if (row.isNullAt(j)) Double.NaN else row.getDouble(j)
          origIdx -> CheckResult(c.name, v, !v.isNaN && c.passes(v))
        }.toMap
      }
    checks.indices.map(i => structural.getOrElse(i, fromRow(i)))
  }

  /** Results as a DataFrame (for the metrics warehouse sink). */
  def runAsDF(df: DataFrame, checks: Seq[QualityCheck]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    run(df, checks).toDF("check_name", "observed", "passed")
  }

  /** Composite exit-code gate à la scripts/run_quality_check.py (the
    * reference CI reads the process exit to learn WHICH expectation
    * failed, not just that one did): bit i is set iff check i failed,
    * so 0 = all green, 5 = checks 0 and 2 failed, etc. Suites longer
    * than 62 checks collapse the tail into the overflow bit 62 (bit 63
    * would flip the sign; POSIX truncates exit statuses to 8 bits, so
    * callers that need the full mask read the returned Long — the CLI
    * also prints the failed names). Reserve 2 for operational errors
    * (the reference's convention: 0 pass / non-zero with failure
    * identity / 2 crash) by never mapping a check to a lone bit 1 …
    * that would collide; instead the CLI exits with
    * `min(code, 125)`-style clamping left to the caller. */
  def gateCode(results: Seq[CheckResult]): Long =
    results.zipWithIndex.foldLeft(0L) { case (acc, (r, i)) =>
      if (r.passed) acc
      else if (i < 62) acc | (1L << i)
      else acc | (1L << 62)
    }

  /** Names of the failed checks, in suite order (the human-readable
    * companion of [[gateCode]]'s bitmask). */
  def failedChecks(results: Seq[CheckResult]): Seq[String] =
    results.filterNot(_.passed).map(_.name)

  /** Boolean gate (0/1) — [[gateCode]] carries the failure identity. */
  def gate(results: Seq[CheckResult]): Int =
    if (gateCode(results) == 0L) 0 else 1

  /** Declarative suite loader: parse a Great Expectations expectation
    * suite JSON — the artifact the reference actually ships its gate
    * as (great_expectations/expectations/corc_nah_corpus_suite.json,
    * loaded by scripts/run_quality_check.py:205-260) — into the
    * engine's check list, so a migrating user carries their suite
    * FILE, not a Scala re-transcription. Supported expectation types
    * map onto the native single-pass checks:
    *
    *  - expect_table_columns_to_match_set → [[ColumnSetCheck]]
    *  - expect_column_values_to_not_be_null → [[NotNullCheck]]
    *  - expect_column_values_to_match_regex → [[RegexCheck]]
    *  - expect_column_proportion_of_unique_values_to_be_between →
    *    [[UniquenessCheck]]
    *  - expect_column_value_lengths_to_be_between → [[RangeCheck]]
    *  - expect_column_values_to_be_in_set → [[MembershipCheck]]
    *  - expect_table_row_count_to_be_between → [[RowCountCheck]]
    *
    * An unknown type THROWS — a silently dropped expectation would
    * green-light data the reference gate would fail. One semantic
    * delta, on the conservative side: GE's `mostly` for regex/length
    * checks is a fraction of NON-NULL values; the engine counts nulls
    * in the denominator (as failures), so a column passing here also
    * passes GE, not always vice versa. Membership is equivalent at
    * `mostly` = 1 (nulls pass both). JSON parsing is Jackson — already
    * on every Spark classpath. */
  def loadSuiteJson(json: String): Seq[QualityCheck] = {
    import scala.jdk.CollectionConverters._
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val exps = root.path("expectations")
    require(exps.isArray && exps.size > 0, "suite has no expectations array")
    (0 until exps.size).map { i =>
      val e = exps.get(i)
      val k = e.path("kwargs")
      def column = k.path("column").asText()
      def mostly = if (k.has("mostly")) k.path("mostly").asDouble() else 1.0
      e.path("expectation_type").asText() match {
        case "expect_table_columns_to_match_set" =>
          ColumnSetCheck(k.path("column_set").elements().asScala.map(_.asText()).toSet)
        case "expect_column_values_to_not_be_null" =>
          NotNullCheck(column, mostly)
        case "expect_column_values_to_match_regex" =>
          RegexCheck(column, k.path("regex").asText(), mostly)
        case "expect_column_proportion_of_unique_values_to_be_between" =>
          // GE allows one-sided bounds on every *_to_be_between
          // expectation — a missing bound means unbounded on that
          // side, never 0 (Jackson's MissingNode.asDouble()).
          UniquenessCheck(column,
            if (k.has("min_value")) k.path("min_value").asDouble() else 0.0,
            if (k.has("max_value")) k.path("max_value").asDouble() else 1.0)
        case "expect_column_value_lengths_to_be_between" =>
          RangeCheck(s"len_$column", org.apache.spark.sql.functions.length(col(column)),
            if (k.has("min_value")) k.path("min_value").asDouble() else 0.0,
            if (k.has("max_value")) k.path("max_value").asDouble()
            else Double.MaxValue, mostly)
        case "expect_column_values_to_be_in_set" =>
          MembershipCheck(column,
            k.path("value_set").elements().asScala.map(_.asText()).toSeq, mostly)
        case "expect_table_row_count_to_be_between" =>
          RowCountCheck(
            if (k.has("min_value")) k.path("min_value").asLong() else 0L,
            if (k.has("max_value")) k.path("max_value").asLong() else Long.MaxValue)
        case other =>
          throw new IllegalArgumentException(s"unsupported expectation_type: $other")
      }
    }
  }

  /** [[loadSuiteJson]] over a file path. */
  def loadSuiteFile(path: String): Seq[QualityCheck] =
    loadSuiteJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** The reference's Great Expectations suite, check for check
    * (/root/reference/great_expectations/expectations/
    * corc_nah_corpus_suite.json:26-273): es 100% non-null, nah ≥95%,
    * macron regex ≥30%, es uniqueness 98-100%, length 5-1000 ≥98%,
    * source catalog 100%, volume bounds. All evaluated in ONE pass.
    * Volume bounds parameterized (the GE suite pins 100k-10M for the
    * production corpus). */
  def corpusSuite(minVolume: Long = 100000L, maxVolume: Long = 10000000L): Seq[QualityCheck] = Seq(
    NotNullCheck("es", 1.0),
    NotNullCheck("nah", 0.95),
    RegexCheck("nah", "[āēīōūĀĒĪŌŪ]", 0.30),
    UniquenessCheck("es", 0.98, 1.0),
    RangeCheck("len_es", org.apache.spark.sql.functions.length(col("es")), 5, 1000, 0.98),
    MembershipCheck("source", Seq(
      "huggingface", "youtube", "pdf", "manual", "synthetic", "bible", "unknown")),
    RowCountCheck(minVolume, maxVolume))
}
