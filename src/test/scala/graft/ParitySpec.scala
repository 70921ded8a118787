package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Golden-snapshot parity harness, the engine's counterpart of the
  * reference's `make golden` → committed `benchmark/golden_*.jsonl` +
  * MD5 checksums asserted by
  * `tests/integration/test_parity_with_legacy.py:81-399`
  * (/root/reference/Makefile:54-63).
  *
  * A committed silver+diamond JSONL fixture (legacy key variants, a
  * DPO pair, an audio-gated record, NFD Unicode, a malformed line, a
  * cross-layer duplicate) runs through the COMPOSED [[UnifyPipeline]]
  * and the canonicalized gold output must be byte-identical to the
  * committed snapshot — any drift in coalescing, normalization,
  * validity, dedup priority, seeded split, or the JSONL sink fails
  * here even when every per-operator oracle still passes.
  *
  * Canonical form: each output line re-serialized with sorted keys and
  * ASCII escapes, tagged with its `split=` partition, all lines
  * sorted; the committed artifact is that text plus its MD5 in
  * `checksums.txt`. Regenerate deliberately with
  * `GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.ParitySpec"` and review
  * the diff — a golden change IS a behavior change.
  */
class ParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val fixtureDir = Paths.get("src/test/resources/parity")
  private val goldenDir  = fixtureDir.resolve("golden")

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.configure(
      com.fasterxml.jackson.databind.SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)
    m.getFactory.configure(
      com.fasterxml.jackson.core.JsonGenerator.Feature.ESCAPE_NON_ASCII, true)
    m
  }

  /** Sorted-key ASCII-escaped re-serialization + split tag per line,
    * lines sorted — invariant to Spark's task/file layout, sensitive
    * to every value byte. */
  private def canonicalize(goldDir: Path): String = {
    val lines = Files.walk(goldDir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.contains(".json"))
      .flatMap { p =>
        val split = p.toString.split("/").find(_.startsWith("split="))
          .getOrElse(sys.error(s"no split= partition dir in $p")).stripPrefix("split=")
        Files.readAllLines(p, StandardCharsets.UTF_8).asScala.filter(_.nonEmpty).map { l =>
          val m = mapper.readValue(l, classOf[java.util.Map[String, Object]])
          val t = new java.util.TreeMap[String, Object](m)
          t.put("split", split)
          mapper.writeValueAsString(t)
        }
      }.toSeq.sorted
    lines.mkString("\n") + "\n"
  }

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def statsJson(st: UnifyPipeline.UnifyStats): String =
    s"""{"input":${st.input},"valid":${st.valid},"deduped":${st.deduped},""" +
      s""""train":${st.train},"validation":${st.validation},"test":${st.test},""" +
      s""""nah_records":${st.nahRecords},"myn_records":${st.mynRecords},""" +
      s""""malformed":${st.malformed}}"""

  private def runPipeline(): (String, UnifyPipeline.UnifyStats) = {
    val out = Files.createTempDirectory("graft-parity").resolve("gold")
    val stats = UnifyPipeline.run(spark,
      Seq(fixtureDir.resolve("silver").toString + "/*.jsonl"),
      Seq(fixtureDir.resolve("diamond").toString + "/*.jsonl"),
      out.toString, seed = 42L)
    (canonicalize(out), stats)
  }

  test("composed unify pipeline reproduces the committed golden snapshot byte-for-byte") {
    val (canonical, stats) = runPipeline()
    val goldFile  = goldenDir.resolve("expected_gold.jsonl")
    val statsFile = goldenDir.resolve("expected_stats.json")
    val sumFile   = goldenDir.resolve("checksums.txt")

    if (sys.env.get("GRAFT_REGEN_GOLDEN").contains("1")) {
      Files.createDirectories(goldenDir)
      Files.write(goldFile, canonical.getBytes(StandardCharsets.UTF_8))
      Files.write(statsFile, (statsJson(stats) + "\n").getBytes(StandardCharsets.UTF_8))
      Files.write(sumFile,
        s"${md5(canonical)}  expected_gold.jsonl\n".getBytes(StandardCharsets.UTF_8))
      info(s"regenerated golden snapshot: ${md5(canonical)}")
    } else {
      assert(Files.exists(goldFile),
        "golden snapshot missing — run GRAFT_REGEN_GOLDEN=1 sbt 'testOnly graft.ParitySpec'")
      val expected = new String(Files.readAllBytes(goldFile), StandardCharsets.UTF_8)
      assert(canonical === expected,
        "gold output drifted from the committed golden snapshot")
      val expectedSum = new String(Files.readAllBytes(sumFile), StandardCharsets.UTF_8)
        .trim.split("\\s+").head
      assert(md5(canonical) === expectedSum, "golden checksum mismatch")
      assert(statsJson(stats) ===
        new String(Files.readAllBytes(statsFile), StandardCharsets.UTF_8).trim,
        "pipeline stats drifted from the committed golden stats")
    }
  }

  test("golden snapshot pins the load-bearing semantics") {
    val gold = new String(
      Files.readAllBytes(goldenDir.resolve("expected_gold.jsonl")), StandardCharsets.UTF_8)
    // Unicode preservation, NFC-composed: the NFD fixture's a+U+0304
    // must come out as precomposed U+0101 (ā), never the combining mark
    assert(gold.contains("\\u0101") && !gold.contains("\\u0304"),
      "macron must be NFC-composed in gold output")
    // layer priority: the diamond copy of the cross-layer duplicate
    // wins (capitalized surface + curated source), the silver copy dies
    assert(gold.contains("El perro corre") && gold.contains("\"curated\""))
    assert(!gold.contains("el perro corre"), "silver duplicate must lose to diamond")
    // legacy coalescing: DPO prompt/chosen and audio-gated nah landed
    // in the unified es/nah columns
    assert(gold.contains("Como estas?") && gold.contains("Tlazohcamati"))
    // invalid rows never reach gold
    assert(!gold.contains("Texto solo espanol"), "es-only row must fail validity")
    // split partitioning round-tripped
    assert(gold.contains("\"split\":\"train\""))
  }
}
