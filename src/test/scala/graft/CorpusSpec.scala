package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CorpusIO

/** Shadow-mode integration tests over temp-dir fixtures, mirroring the
  * reference's test_shadow_mode.py coverage: legacy input formats
  * (DPO, audio-transcript, Py-Elotl dump), dedup-across-layers with
  * Diamond priority, reproducible seeds, Unicode preservation.
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writeTemp(name: String, lines: Seq[String]): Path = {
    val dir = Files.createTempDirectory("graft-corpus")
    val f = dir.resolve(name)
    Files.writeString(f, lines.mkString("\n"))
    f
  }

  test("JSONL scan coalesces every legacy key variant (P1)") {
    val f = writeTemp("legacy.jsonl", Seq(
      """{"es_translation": "Buenos días", "nah_translation": "Cualli tonalli", "source_file": "a.jsonl"}""",
      """{"prompt": "¿Cómo estás?", "chosen": "Quēnin timotlaneltoquia?", "rejected": "bad"}""",
      """{"original_audio_text": "Piyali", "detected_language": "nah", "original_es": "Hola"}""",
      """{"original_audio_text": "Ma'alob", "detected_language": "myn", "original_es": "Bien"}""",
      """{"es": "Gracias", "nah": "Tlazohcamati", "source": "test_1"}""",
      """not valid json at all"""))
    val df = CorpusIO.readJsonl(spark, Seq(f.toString), "silver")
    val rows = df.orderBy("es").collect()
    assert(rows.length === 5, "malformed line dropped, valid rows kept")
    val byEs = rows.map(r => r.getAs[String]("es") ->
      (r.getAs[String]("nah"), r.getAs[String]("myn"))).toMap
    assert(byEs("Buenos días") === ("Cualli tonalli", null))
    assert(byEs("¿Cómo estás?") === ("Quēnin timotlaneltoquia?", null))
    assert(byEs("Hola") === ("Piyali", null))
    assert(byEs("Bien") === (null, "Ma'alob"))
    assert(rows.forall(_.getAs[String]("layer") === "silver"))
    val originForLegacy = rows.find(_.getAs[String]("es") == "Buenos días").get.getAs[String]("origin_file")
    assert(originForLegacy === "a.jsonl", "source_file wins over filename")
  }

  test("JSON-dump scan unwraps the Py-Elotl envelope incl. sp alias (S4)") {
    val f = writeTemp("dump.json", Seq(
      """{"items": [
        |  {"original": {"es": "Hola", "nah": "Piyali"}},
        |  {"original": {"sp": "Gracias", "nah": "Tlazohcamati"}}
        |]}""".stripMargin))
    val df = CorpusIO.readJsonDump(spark, f.toString, "silver")
    val rows = df.orderBy("es").collect()
    assert(rows.map(_.getAs[String]("es")).toSeq === Seq("Gracias", "Hola"))
    assert(rows.map(_.getAs[String]("nah")).toSeq === Seq("Tlazohcamati", "Piyali"))
  }

  test("unify: diamond beats silver on duplicate keys; invalid rows dropped") {
    val silver = writeTemp("s.jsonl", Seq(
      """{"es": "Hola", "nah": "Niltze", "source": "hf"}""",
      """{"es": "Solo español"}""",
      """{"es": "Adiós", "nah": "Oc cepa"}"""))
    val diamond = writeTemp("d.jsonl", Seq(
      """{"es": "Hola", "nah": "Niltze", "source": "curated"}"""))
    val out = UnifyPipeline.unify(Seq(
      CorpusIO.readJsonl(spark, Seq(silver.toString), "silver"),
      CorpusIO.readJsonl(spark, Seq(diamond.toString), "diamond"))).cache()
    assert(out.count() === 2, "invalid (es-only) dropped; dup collapsed")
    val hola = out.filter(col("es") === "Hola").head()
    assert(hola.getAs[String]("layer") === "diamond", "diamond wins")
    out.unpersist()
  }

  test("unify preserves macrons end-to-end (zero-tolerance Unicode invariant)") {
    val f = writeTemp("u.jsonl", Seq(
      """{"es": "Gracias", "nah": "Tlazohcāmati  ēīōū"}"""))
    val out = UnifyPipeline.unify(Seq(CorpusIO.readJsonl(spark, Seq(f.toString), "silver")))
    val nah = out.head().getAs[String]("nah")
    assert(nah === "Tlazohcāmati ēīōū", "macrons preserved, whitespace collapsed")
  }

  test("unify split assignment is seed-reproducible") {
    val f = writeTemp("r.jsonl",
      (1 to 60).map(i => s"""{"es": "frase número $i", "nah": "tlahtolli $i"}"""))
    val layers = Seq(CorpusIO.readJsonl(spark, Seq(f.toString), "silver"))
    val a = UnifyPipeline.unify(layers).select("es", "split").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val b = UnifyPipeline.unify(layers).select("es", "split").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a === b)
    assert(a.values.toSet.contains("train"))
  }

  test("typed Dataset[Record] view: encoders, validity, completeness") {
    val f = writeTemp("t.jsonl", Seq(
      """{"es": "Hola", "nah": "Niltze", "source": "hf", "layer": "silver"}""",
      """{"es": "Solo", "source": "hf", "layer": "silver"}"""))
    val ds = Record.from(CorpusIO.readJsonl(spark, Seq(f.toString), "silver"))
    val recs = ds.collect().sortBy(_.es)
    assert(recs.length === 2)
    val hola = recs.find(_.es.contains("Hola")).get
    assert(hola.isValid && hola.completeness === 2)
    assert(!recs.find(_.es.contains("Solo")).get.isValid)
    // typed filter behaves like the column validity filter
    assert(ds.filter(_.isValid).count() ===
      CorpusIO.validityFilter(ds.toDF()).count())
  }

  test("jsonlFileStats counts malformed lines per file with bounded error samples (S3)") {
    val f = writeTemp("mixed.jsonl", Seq(
      """{"es": "Hola", "nah": "Niltze"}""",
      """not valid json at all""",
      """{"es": "Adiós", "nah": "Oc cepa"}""",
      """{broken""",
      """also broken { ]""",
      "",
      """{"es": "Gracias", "nah": "Tlazohcamati"}"""))
    val stats = CorpusIO.jsonlFileStats(spark, Seq(f.toString)).head()
    assert(stats.getAs[String]("file") === "mixed.jsonl")
    assert(stats.getAs[Long]("lines") === 6, "blank lines not counted")
    assert(stats.getAs[Long]("parsed") === 3)
    assert(stats.getAs[Long]("malformed") === 3)
    val samples = stats.getSeq[String](stats.fieldIndex("error_samples"))
    assert(samples.length === 3 && samples.forall(_.nonEmpty))
    // sample cap honored
    val capped = CorpusIO.jsonlFileStats(spark, Seq(f.toString), sampleErrors = 2).head()
    assert(capped.getSeq[String](capped.fieldIndex("error_samples")).length === 2)
  }

  test("category + nested metadata survive read, unify and JSONL round-trip (§1.1)") {
    val f = writeTemp("meta.jsonl", Seq(
      """{"es": "Hola", "nah": "Niltze", "category": "saludos",
        | "metadata": {"record_id": "r1", "created_at": "2026-01-01T06:00:00.000Z",
        |   "dialect": "central", "quality_score": 0.9, "is_validated": true}}"""
        .stripMargin.replace("\n", ""),
      """{"es": "Adiós", "nah": "Oc cepa"}"""))
    val df = CorpusIO.readJsonl(spark, Seq(f.toString), "silver")
    val hola = df.filter(col("es") === "Hola").head()
    assert(hola.getAs[String]("category") === "saludos")
    val meta = hola.getAs[org.apache.spark.sql.Row]("metadata")
    assert(meta.getAs[String]("record_id") === "r1")
    assert(meta.getAs[String]("dialect") === "central")
    assert(meta.getAs[Double]("quality_score") === 0.9)
    assert(meta.getAs[Boolean]("is_validated"))
    assert(df.filter(col("es") === "Adiós").head().isNullAt(
      df.columns.indexOf("metadata")), "absent metadata reads as null struct")

    // typed view carries the nested struct
    val recs = Record.from(df).collect()
    val typed = recs.find(_.es.contains("Hola")).get
    assert(typed.category === Some("saludos"))
    assert(typed.metadata.get.quality_score === Some(0.9))

    // through unify and the JSONL sink and back
    val gold = UnifyPipeline.unify(Seq(df))
    val dir = Files.createTempDirectory("graft-meta-gold").toString + "/gold"
    CorpusIO.writeJsonl(gold, dir)
    val back = spark.read.schema(
      CorpusIO.recordSchema.add("split", org.apache.spark.sql.types.StringType)).json(dir)
    val backHola = back.filter(col("es") === "Hola").head()
    assert(backHola.getAs[String]("category") === "saludos")
    assert(backHola.getAs[org.apache.spark.sql.Row]("metadata")
      .getAs[String]("record_id") === "r1")
  }

  test("run(): honest stats — parsed input, pre-dedup valid, per-source malformed") {
    val silver = writeTemp("stats.jsonl", Seq(
      """{"es": "Hola", "nah": "Niltze"}""",
      """{"es": "Hola", "nah": "Niltze"}""",       // duplicate → valid > deduped
      """{"es": "Adiós", "nah": "Oc cepa"}""",
      """{"es": "Solo español"}""",                // invalid (no indigenous text)
      """this line is not json"""))               // malformed
    val goldDir = Files.createTempDirectory("graft-stats-gold").toString + "/gold"
    val stats = UnifyPipeline.run(spark, Seq(silver.toString), Nil, goldDir)
    assert(stats.input === 4, "input = parsed records, malformed excluded")
    assert(stats.malformed === 1)
    assert(stats.valid === 3, "pre-dedup valid count (not a copy of deduped)")
    assert(stats.deduped === 2, "duplicate collapsed")
    assert(stats.valid > stats.deduped)
    assert(stats.sources.map(s => (s.layer, s.lines, s.parsed, s.malformed)) ===
      Seq(("silver", 5L, 4L, 1L)))
  }

  test("CSV registry: pending discovery + status update flow (S6, discovery.py)") {
    val dir = Files.createTempDirectory("graft-registry").toString + "/sources"
    val registry = spark.createDataFrame(Seq(
      ("s1", "bible-nah", "Pending"),
      ("s2", "tatoeba", "Ingested"),
      ("s3", "flores", "Pending")))
      .toDF("source_id", "source_name", "ingestion_status")
    CorpusIO.writeCsv(registry, dir)

    val pending = CorpusIO.pendingSources(CorpusIO.readCsv(spark, dir))
      .collect().map(_.getAs[String]("source_id")).sorted
    assert(pending.toSeq === Seq("s1", "s3"))

    CorpusIO.updateSourceStatus(spark, dir, "s1", "Ingested")
    val after = CorpusIO.readCsv(spark, dir).collect()
      .map(r => r.getAs[String]("source_id") -> r.getAs[String]("ingestion_status")).toMap
    assert(after("s1") === "Ingested", "target row updated")
    assert(after("s2") === "Ingested" && after("s3") === "Pending", "others untouched")
    assert(CorpusIO.pendingSources(CorpusIO.readCsv(spark, dir)).count() === 1)
  }

  test("text corpus scan: trim + min-length verse filter (S11, driver_bible.py:39-47)") {
    val f = writeTemp("verses.txt", Seq(
      "In ipan pehuallotl, Dios quichiuh ilhuicatl ihuan tlaltipactli.",
      "   short   ",
      "",
      "  Ihuan Dios quitoh: Machihua tlanextli.  "))
    val out = CorpusIO.readTextCorpus(spark, f.toString, minLen = 10).collect()
    assert(out.length === 2, "blank and short lines dropped")
    assert(out.forall(r => r.getAs[String]("text") == r.getAs[String]("text").trim))
    assert(out.map(_.getAs[String]("origin_file")).toSet === Set("verses.txt"))
  }

  test("XML verse scan: extract bodies, strip inner tags (S11, driver_bible.py:49-66)") {
    val f = writeTemp("bible.xml", Seq(
      """<bible><book name="Gen">""",
      """<verse id="1">In ipan pehuallotl, <i>Dios</i> quichiuh ilhuicatl.</verse>""",
      """<verse id="2">Ihuan Dios quitoh:""",
      """Machihua tlanextli.</verse>""",
      """<verse id="3"></verse>""",
      """</book></bible>"""))
    val out = CorpusIO.readXmlVerses(spark, f.toString).collect()
    assert(out.length === 2, "empty verse dropped")
    val texts = out.map(_.getAs[String]("text"))
    assert(texts.exists(_ == "In ipan pehuallotl, Dios quichiuh ilhuicatl."),
      "inner tags stripped")
    assert(texts.exists(_.startsWith("Ihuan Dios quitoh:")), "multi-line verse kept whole")
  }

  test("JSONL→Parquet converter round-trips rows and schema (S15)") {
    val f = writeTemp("conv.jsonl", Seq(
      """{"es": "Hola", "nah": "Niltze", "n": 1}""",
      """{"es": "Adiós", "nah": "Oc cepa", "n": 2}"""))
    val outDir = Files.createTempDirectory("graft-conv").toString + "/parquet"
    CorpusIO.convertJsonlToParquet(spark, f.toString, outDir)
    val back = spark.read.parquet(outDir)
    assert(back.count() === 2)
    assert(back.columns.sorted.toSeq === Seq("es", "n", "nah"))
    assert(back.filter(col("n") === 1).head().getAs[String]("nah") === "Niltze")
  }

  test("gold JSONL sink omits null fields and keeps UTF-8") {
    val f = writeTemp("g.jsonl", Seq("""{"es": "Adiós", "nah": "Tlazohcāmati"}"""))
    val out = UnifyPipeline.unify(Seq(CorpusIO.readJsonl(spark, Seq(f.toString), "silver")))
    val dir = Files.createTempDirectory("graft-gold")
    CorpusIO.writeJsonl(out, dir.toString + "/gold")
    val written = Files.list(new java.io.File(dir.toString + "/gold").toPath)
      .toArray.map(_.toString).filter(_.endsWith(".json"))
    val content = written.flatMap(p => scala.io.Source.fromFile(p, "UTF-8").getLines()).mkString("\n")
    assert(content.contains("Tlazohcāmati"), "UTF-8 macron must survive the sink")
    assert(!content.contains("myn"), "null field omitted from JSON")
  }
}
