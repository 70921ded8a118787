package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Quality
import graft.operators.Quality._

class QualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    ("Hola", "Niltze", "huggingface"),
    ("Gracias", "Tlazohcāmati", "youtube"),
    ("Adiós", null, "pdf"),
    ("Hola", "Niltze", "huggingface")
  ).toDF("es", "nah", "source")

  test("the GE-suite analog evaluates in one pass with correct observations") {
    val results = Quality.run(corpus, Seq(
      NotNullCheck("es", 1.0),
      NotNullCheck("nah", 0.95),
      UniquenessCheck("es", 0.98),
      RowCountCheck(1, 1000000),
      RangeCheck("len_es", length(col("es")), 3, 1000, 0.98),
      MembershipCheck("source", Seq("huggingface", "youtube", "pdf", "manual", "synthetic", "bible", "unknown")),
      RegexCheck("nah", "[āēīōū]", 0.25)
    )).map(r => r.name -> r).toMap

    assert(results("not_null_es").passed && results("not_null_es").observed === 1.0)
    assert(!results("not_null_nah").passed && results("not_null_nah").observed === 0.75)
    assert(!results("unique_es").passed && results("unique_es").observed === 0.75)
    assert(results("row_count").passed)
    assert(results("len_es").passed)
    assert(results("member_source").passed)
    assert(results("regex_nah").passed && results("regex_nah").observed === 0.25)
  }

  test("loadSuiteFile parses the reference GE suite and agrees with corpusSuite") {
    val loaded = Quality.loadSuiteFile(
      "/root/reference/great_expectations/expectations/corc_nah_corpus_suite.json")
    assert(loaded.size === 8)
    assert(loaded.head === ColumnSetCheck(
      Set("es", "nah", "myn", "source", "layer", "origin_file")),
      "schema expectation must load first, with the reference's column set")

    // 20-row fixture on the common ground of the JSON suite and the
    // hard-coded corpusSuite (lowercase macrons, shared source values):
    // every aligned check must reach the same verdict under both.
    val fixture = (1 to 20).map { i =>
      (f"frase de ejemplo numero $i%02d",
        if (i == 20) null else if (i <= 8) s"tlazohcāmati $i" else s"niltze $i",
        null: String,
        Seq("huggingface", "youtube", "pdf", "manual", "synthetic")(i % 5),
        "silver", "fixture.jsonl")
    }.toDF("es", "nah", "myn", "source", "layer", "origin_file")

    val fromFile = Quality.run(fixture, loaded)
    val hardCoded = Quality.run(fixture, Quality.corpusSuite())
    assert(fromFile.head.passed, "fixture matches the reference column set")
    // drop the schema check; remaining 7 align positionally with corpusSuite
    assert(fromFile.drop(1).map(_.passed) === hardCoded.map(_.passed),
      s"file-loaded and hard-coded suite verdicts diverge:\n$fromFile\n$hardCoded")
    // the fixture exercises both outcomes: volume bound fails (20 rows
    // vs the suite's pinned 100k minimum), everything else passes
    assert(fromFile.drop(1).init.forall(_.passed))
    assert(!fromFile.last.passed && fromFile.last.name === "row_count")

    // structural check actually bites: a frame missing a column fails
    val broken = fixture.drop("origin_file")
    assert(!Quality.run(broken, loaded).head.passed)

    // unknown expectation types must throw, not silently drop
    val bad = """{"expectations": [{"expectation_type": "expect_magic", "kwargs": {}}]}"""
    intercept[IllegalArgumentException](Quality.loadSuiteJson(bad))

    // GE allows ONE-SIDED *_to_be_between bounds: a missing bound is
    // unbounded on that side (Jackson's MissingNode.asDouble() = 0.0
    // must never become the max)
    val oneSided = Quality.loadSuiteJson("""{"expectations": [
      {"expectation_type": "expect_column_value_lengths_to_be_between",
       "kwargs": {"column": "es", "min_value": 10}},
      {"expectation_type": "expect_column_value_lengths_to_be_between",
       "kwargs": {"column": "es", "max_value": 100}},
      {"expectation_type": "expect_column_proportion_of_unique_values_to_be_between",
       "kwargs": {"column": "es", "max_value": 1.0}},
      {"expectation_type": "expect_table_row_count_to_be_between",
       "kwargs": {"max_value": 1000}}]}""")
    val oneSidedRun = Quality.run(fixture, oneSided)
    assert(oneSidedRun.forall(_.passed),
      s"one-sided bounds must be open, not zero: $oneSidedRun")
  }

  test("gate returns nonzero when any check fails") {
    val pass = Quality.run(corpus, Seq(RowCountCheck(1)))
    val fail = Quality.run(corpus, Seq(RowCountCheck(100)))
    assert(Quality.gate(pass) === 0)
    assert(Quality.gate(fail) === 1)
  }

  test("gateCode identifies WHICH checks failed (bit i = check i)") {
    // suite: [row_count ok, not_null_nah FAIL, unique_es FAIL,
    //         not_null_es ok] → bits 1 and 2 → code 6
    val suite = Seq(RowCountCheck(1), NotNullCheck("nah", 0.95),
      UniquenessCheck("es", 0.98, 1.0), NotNullCheck("es", 1.0))
    val results = Quality.run(corpus, suite)
    assert(Quality.gateCode(results) === 6L)
    assert(Quality.failedChecks(results) === Seq("not_null_nah", "unique_es"))
    // single failures map to their own bit
    assert(Quality.gateCode(Quality.run(corpus, Seq(RowCountCheck(100)))) === 1L)
    assert(Quality.gateCode(Quality.run(corpus,
      Seq(RowCountCheck(1), RowCountCheck(100)))) === 2L)
    // all-green is exactly 0 regardless of suite size
    assert(Quality.gateCode(Quality.run(corpus,
      Seq(RowCountCheck(1), NotNullCheck("es", 1.0)))) === 0L)
    // overflow: a failure past bit 61 collapses into bit 62
    val many = Seq.tabulate(63)(_ => CheckResult("c", 0.0, passed = true)) :+
      CheckResult("tail_fail", 0.0, passed = false)
    assert(Quality.gateCode(many) === (1L << 62))
  }

  test("runAsDF yields warehouse-sinkable frame") {
    val df = Quality.runAsDF(corpus, Seq(RowCountCheck(1), NotNullCheck("es", 1.0)))
    assert(df.columns.toSeq === Seq("check_name", "observed", "passed"))
    assert(df.count() === 2)
  }

  test("relativeFilter: exact per-stratum top-fraction, ties deterministic, small strata keep one") {
    import spark.implicits._
    // stratum a: 10 rows scored 1..10; b: 3 rows; c: 1 row
    val rows = (1 to 10).map(i => (i.toLong, "a", i)) ++
      Seq((11L, "b", 5), (12L, "b", 5), (13L, "b", 9), (14L, "c", 1))
    val df = rows.toDF("id", "g", "score").repartition(5)
    val kept = Quality.relativeFilter(df, col("score"), col("g"),
        keepFrac = 0.4, tieBreak = Seq(col("id")))
      .select("id").as[Long].collect().toSet
    // a keeps ceil(4.0)=4 best (7,8,9,10); b keeps ceil(1.2)=2 (13, then
    // the 5-tie broken by id → 11); c keeps ceil(0.4)=1
    assert(kept === Set(7L, 8L, 9L, 10L, 13L, 11L, 14L))
    // keepFrac=1 keeps everything; float-artifact guard: 0.4 * 35 rows
    assert(Quality.relativeFilter(df, col("score"), col("g"), 1.0,
      Seq(col("id"))).count() === 14L)
    val big = (1 to 35).map(i => (i.toLong, "z", i)).toDF("id", "g", "score")
    assert(Quality.relativeFilter(big, col("score"), col("g"), 0.4,
      Seq(col("id"))).count() === 14L, "0.4*35 must quota 14, not 15")
  }

  test("c4LineRules: line punctuation/word-count/blacklist rules + page gates") {
    import spark.implicits._
    val good = "this line has enough words and ends properly."
    val docs = Seq(
      (1L, Seq(good,
        "short one.", // < 5 words
        "no terminal punctuation on this line here",
        "this line mentions JavaScript so it is dropped.",
        "another perfectly fine sentence line right here!",
        "a third good line closes out the document?").mkString("\n")),
      (2L, good + "\nonly one good line survives here\nnope."), // < 2 kept
      (3L, good + " lorem ipsum\n" + good + "\n" + good), // page blacklist
      (4L, "function f() {\n" + good + "\n" + good + "\n" + good), // code page
      (5L, good + "\n" + good) // exactly minKeptLines
    ).toDF("doc_id", "text")
    val out = Quality.c4LineRules(docs, "text", minWordsPerLine = 5, minKeptLines = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet === Set(1L, 5L))
    assert(out(1L).split("\n").length === 3,
      "doc 1 keeps exactly the three compliant lines")
    assert(!out(1L).toLowerCase.contains("javascript"))
    assert(out(1L).startsWith(good), "kept lines preserve original order")
    assert(out(5L) === good + "\n" + good)
    // quote-terminated lines count as terminal punctuation
    val quoted = Seq((9L, "he said the words \"stop right there now.\"\n" + good))
      .toDF("doc_id", "text")
    assert(Quality.c4LineRules(quoted, "text", minKeptLines = 2).count() === 1)
  }
}
