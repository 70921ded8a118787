package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Pdf

class PdfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Minimal one-content-stream PDF around `content` (raw bytes). */
  private def pdf(content: Array[Byte], filter: String = ""): Array[Byte] = {
    val head = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length}$filter >> stream\n").getBytes(Latin1)
    val tail = "\nendstream endobj\n%%EOF\n".getBytes(Latin1)
    head ++ content ++ tail
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    out.toByteArray
  }

  test("uncompressed content stream: Tj concatenation, T* and Td line breaks") {
    val content = "BT /F1 12 Tf 72 720 Td (Hello ) Tj (World) Tj T* (Line2) Tj ET"
      .getBytes(Latin1)
    val r = Pdf.extractText(pdf(content))
    assert(r.ok && r.pages === 1)
    assert(r.text === "Hello World\nLine2")
  }

  test("FlateDecode content stream inflates with the JDK codec") {
    val content = "BT (Compressed) Tj T* (page text) Tj ET".getBytes(Latin1)
    val r = Pdf.extractText(pdf(deflate(content), filter = " /Filter /FlateDecode"))
    assert(r.ok && r.pages === 1)
    assert(r.text === "Compressed\npage text")
  }

  test("TJ arrays: kerning below -180 renders a word gap, above does not") {
    val content = "BT [(Hel) -20 (lo) -250 (world)] TJ ET".getBytes(Latin1)
    val r = Pdf.extractText(pdf(content))
    assert(r.text === "Hello world")
  }

  test("escapes, nested parens, octal, hex and UTF-16BE strings") {
    val content = ("BT (a\\(b\\)c) Tj T* ((nested) ok) Tj T* (\\101\\102) Tj " +
      "T* <48495A> Tj T* <FEFF00E400DF> Tj ET").getBytes(Latin1)
    val r = Pdf.extractText(pdf(content))
    assert(r.text === "a(b)c\n(nested) ok\nAB\nHIZ\näß")
  }

  test("non-text streams are stepped over; pages counts text-bearing streams") {
    val textStream = "BT (Only page) Tj ET".getBytes(Latin1)
    val imgStream = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val doc = ("%PDF-1.4\n5 0 obj << /Subtype /Image /Length 64 >> stream\n").getBytes(Latin1) ++
      imgStream ++ "\nendstream endobj\n".getBytes(Latin1) ++
      (s"4 0 obj << /Length ${textStream.length} >> stream\n").getBytes(Latin1) ++
      textStream ++ "\nendstream endobj\n%%EOF\n".getBytes(Latin1)
    val r = Pdf.extractText(doc)
    assert(r.ok && r.pages === 1 && r.text === "Only page")
  }

  test("marked-content inline dictionaries inside BT/ET are skipped, not lexed as hex") {
    // the tagged-PDF shape Word/InDesign emit
    val content = "BT /P << /MCID 0 >> BDC (Tagged text) Tj EMC ET".getBytes(Latin1)
    val r = Pdf.extractText(pdf(content))
    assert(r.ok && r.text === "Tagged text")
  }

  test("FlateDecode is detected through a nested /DecodeParms dictionary") {
    val content = "BT (Nested dict page) Tj ET".getBytes(Latin1)
    val r = Pdf.extractText(pdf(deflate(content),
      filter = " /Filter /FlateDecode /DecodeParms << /Columns 4 >>"))
    assert(r.ok && r.text === "Nested dict page")
  }

  test("a '>>' inside a string value in the stream dict cannot hide /FlateDecode") {
    val content = "BT (Title trap page) Tj ET".getBytes(Latin1)
    val r = Pdf.extractText(pdf(deflate(content),
      filter = " /Filter /FlateDecode /Title (a >> b)"))
    assert(r.ok && r.text === "Title trap page")
  }

  test("'obj' inside a dict string value cannot derail the dict anchor") {
    val content = "BT (Anchored page) Tj ET".getBytes(Latin1)
    val r = Pdf.extractText(pdf(deflate(content),
      filter = " /Filter /FlateDecode /Title (An object summary)"))
    assert(r.ok && r.text === "Anchored page")
  }

  test("hex strings drive the quote show operators too") {
    val content = "BT (first) Tj <FEFF0073> ' ET".getBytes(Latin1)
    val r = Pdf.extractText(pdf(content))
    assert(r.text === "first\ns")
  }

  test("a malformed stream is skipped; the rest of the document still extracts") {
    val bad = "BT <4z8> Tj ET".getBytes(Latin1) // non-hex chars in hex string
    val good = "BT (survivor page) Tj ET".getBytes(Latin1)
    val doc = "%PDF-1.4\n".getBytes(Latin1) ++
      (s"5 0 obj << /Length ${bad.length} >> stream\n").getBytes(Latin1) ++
      bad ++ "\nendstream endobj\n".getBytes(Latin1) ++
      (s"4 0 obj << /Length ${good.length} >> stream\n").getBytes(Latin1) ++
      good ++ "\nendstream endobj\n%%EOF\n".getBytes(Latin1)
    val r = Pdf.extractText(doc)
    assert(r.ok && r.pages === 1 && r.text === "survivor page")
  }

  test("corrupt input and non-PDF bytes extract as ok=false, empty text") {
    val r1 = Pdf.extractText("this is not a pdf at all".getBytes(Latin1))
    assert(!r1.ok && r1.text === "" && r1.pages === 0)
    // valid header, corrupt flate stream → stream skipped, doc still ok
    val r2 = Pdf.extractText(pdf(Array[Byte](1, 2, 3), filter = " /Filter /FlateDecode"))
    assert(r2.ok && r2.text === "" && r2.pages === 0)
  }

  test("fuzz: extractText is total — random and mutated bytes never throw") {
    val rnd = new scala.util.Random(41)
    // pure noise (with and without the magic header)
    for (_ <- 1 to 25) {
      val b = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(b)
      val r1 = Pdf.extractText(b)
      assert(r1.text != null)
      val r2 = Pdf.extractText("%PDF-1.4\n".getBytes(Latin1) ++ b)
      assert(r2.text != null)
    }
    // structured corruption: a valid doc with random bytes flipped —
    // the parser may extract garbage but must return, not throw
    val base = pdf(("BT (Fuzz me) Tj [(a) -300 (b)] TJ <4849> Tj " +
      "/P << /MCID 0 >> BDC (x) ' ET").getBytes(Latin1))
    for (_ <- 1 to 25) {
      val b = base.clone()
      for (_ <- 0 to rnd.nextInt(20)) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      assert(Pdf.extractText(b).text != null)
    }
    // truncation at every region of the valid doc
    for (cut <- Seq(1, 8, 40, base.length / 2, base.length - 3)) {
      assert(Pdf.extractText(base.take(cut)).text != null)
    }
  }

  test("readPdfDir: Spark round-trip over a directory of PDFs (S14)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pdf").toString
    Files.write(java.nio.file.Paths.get(s"$dir/a.pdf"),
      pdf("BT (doc A) Tj ET".getBytes(Latin1)))
    Files.write(java.nio.file.Paths.get(s"$dir/b.pdf"),
      pdf(deflate("BT (doc B compressed) Tj ET".getBytes(Latin1)),
        filter = " /Filter /FlateDecode"))
    Files.write(java.nio.file.Paths.get(s"$dir/broken.pdf"),
      "not a pdf".getBytes(Latin1))
    Files.write(java.nio.file.Paths.get(s"$dir/skip.txt"),
      "ignored by the glob".getBytes(Latin1))
    val out = Pdf.readPdfDir(spark, dir)
      .collect().map(e => (new java.io.File(e.path).getName, e)).toMap
    assert(out.keySet === Set("a.pdf", "b.pdf", "broken.pdf"))
    assert(out("a.pdf").pdf_text === "doc A" && out("a.pdf").pdf_ok)
    assert(out("b.pdf").pdf_text === "doc B compressed" && out("b.pdf").pdf_ok)
    assert(!out("broken.pdf").pdf_ok && out("broken.pdf").pdf_text === "")
  }

  test("synthesize -> extractText inverts exactly: escapes, unicode, multi-page, fuzz") {
    // hand-picked hostile pages: parens, backslashes, octal-range
    // control chars, Latin-1 high bytes, and a >0xFF char forcing the
    // UTF-16BE hex form
    val hostile = Seq(
      "plain words only",
      "parens (nested (deep)) and \\ backslash",
      "tab\there, high byte: äß",
      "beyond latin-1: ā中文 mixed ascii")
    hostile.foreach { page =>
      val r = Pdf.extractText(Pdf.synthesize(Seq(page)))
      assert(r.ok && r.pages === 1 && r.text === page, s"page <$page>")
    }
    // multi-page: join order and page count
    val r3 = Pdf.extractText(Pdf.synthesize(Seq("one", "two (2)", "three")))
    assert(r3.ok && r3.pages === 3 && r3.text === "one\ntwo (2)\nthree")
    // fuzz: random printable + occasional hostile chars round-trip —
    // up to the extractor's per-stream normalization (pages come back
    // trimmed, blank pages drop)
    val rnd = new scala.util.Random(13)
    val alphabet = "abc XYZ()\\%<>[]/#éő" // includes delimiters
    (0 until 60).foreach { _ =>
      val pages = (0 to rnd.nextInt(2)).map(_ =>
        (1 to 1 + rnd.nextInt(40)).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      val expected = pages.map(_.trim).filter(_.nonEmpty)
      val r = Pdf.extractText(Pdf.synthesize(pages))
      assert(r.ok && r.pages === expected.length &&
        r.text === expected.mkString("\n"), s"pages $pages")
    }
  }

  test("synthesize emits a complete xref whose offsets hit 'N 0 obj' headers") {
    val bytes = Pdf.synthesize(Seq("check the xref", "page two"))
    val raw = new String(bytes, Latin1)
    val xrefAt = raw.lastIndexOf("xref\n0 7\n")
    assert(xrefAt > 0, "xref table with 7 entries (2n+3)")
    assert(raw.substring(raw.lastIndexOf("startxref\n") + 10)
      .trim.startsWith(xrefAt.toString), "startxref points at the table")
    val entries = raw.substring(xrefAt).linesIterator.drop(3).take(6).toSeq
    entries.zipWithIndex.foreach { case (e, i) =>
      val off = e.take(10).toInt
      assert(raw.startsWith(s"${i + 1} 0 obj", off), s"object ${i + 1} at $off")
    }
  }

  test("synthesizeModern -> extractText: xref stream + ObjStm + predictor round-trip") {
    val hostile = Seq(
      "plain words only",
      "parens (nested (deep)) and \\ backslash",
      "tab\there, high byte: äß",
      "beyond latin-1: ā中文 mixed ascii")
    hostile.foreach { page =>
      val r = Pdf.extractText(Pdf.synthesizeModern(Seq(page)))
      assert(r.ok && r.pages === 1 && r.text === page, s"page <$page>")
    }
    val r3 = Pdf.extractText(Pdf.synthesizeModern(Seq("one", "two (2)", "three")))
    assert(r3.ok && r3.pages === 3 && r3.text === "one\ntwo (2)\nthree")
    val rnd = new scala.util.Random(17)
    val alphabet = "abc XYZ()\\%<>[]/#éő"
    (0 until 40).foreach { _ =>
      val pages = (0 to rnd.nextInt(2)).map(_ =>
        (1 to 1 + rnd.nextInt(40)).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      val expected = pages.map(_.trim).filter(_.nonEmpty)
      val r = Pdf.extractText(Pdf.synthesizeModern(pages))
      assert(r.ok && r.pages === expected.length &&
        r.text === expected.mkString("\n"), s"pages $pages")
    }
  }

  test("modern layout defeats the lexical scan — only the xref walk orders pages") {
    // content streams are written in REVERSED file order; the page
    // tree carries the real order. The lexical fallback (file order)
    // therefore reverses the pages — proving extractText's result
    // came from the structured walk, and that q153's oracle hash
    // genuinely gates it.
    val bytes = Pdf.synthesizeModern(Seq("alpha", "beta", "gamma"))
    val inflater = new java.util.zip.Inflater()
    try {
      val lex = Pdf.extractLexical(new String(bytes, Latin1), bytes, inflater)
      assert(lex.text === "gamma\nbeta\nalpha", "lexical scan sees file order")
      val structured = Pdf.extractText(bytes)
      assert(structured.text === "alpha\nbeta\ngamma", "walk sees page-tree order")
    } finally inflater.end()
  }

  test("synthesizeCid -> extractText: Type0 font codes decode through the ToUnicode CMap") {
    val hostile = Seq(
      "plain words only",
      "parens (nested (deep)) and \\ backslash",
      "tab\there, high byte: äß",
      "beyond latin-1: ā中文 mixed ascii")
    hostile.foreach { page =>
      val r = Pdf.extractText(Pdf.synthesizeCid(Seq(page)))
      assert(r.ok && r.pages === 1 && r.text === page, s"page <$page>")
    }
    val r3 = Pdf.extractText(Pdf.synthesizeCid(Seq("one", "two (2)", "three")))
    assert(r3.ok && r3.pages === 3 && r3.text === "one\ntwo (2)\nthree")
    // fuzz round-trip, same contract as the classic/modern layouts
    val rnd = new scala.util.Random(29)
    val alphabet = "abc XYZ()\\%<>[]/#éőā中"
    (0 until 40).foreach { _ =>
      val pages = (0 to rnd.nextInt(2)).map(_ =>
        (1 to 1 + rnd.nextInt(40)).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      val expected = pages.map(_.trim).filter(_.nonEmpty)
      val r = Pdf.extractText(Pdf.synthesizeCid(pages))
      assert(r.ok && r.pages === expected.length &&
        r.text === expected.mkString("\n"), s"pages $pages")
    }
  }

  test("CID layout defeats the lexical scan — only the ToUnicode map recovers text") {
    val bytes = Pdf.synthesizeCid(Seq("recoverable words"))
    val inflater = new java.util.zip.Inflater()
    try {
      // the lexical scan has no resource tree: the 2-byte codes decode
      // as control-character soup, never the source words
      val lex = Pdf.extractLexical(new String(bytes, Latin1), bytes, inflater)
      assert(!lex.text.contains("recoverable"),
        s"lexical scan must NOT see through the CID codes: <${lex.text}>")
      val structured = Pdf.extractText(bytes)
      assert(structured.ok && structured.text === "recoverable words",
        "the walk maps codes through the inherited font's CMap")
    } finally inflater.end()
  }

  test("fuzz: CID layout is total under noise, mutation, and truncation") {
    val rnd = new scala.util.Random(31)
    val base = Pdf.synthesizeCid(Seq("mutation target alpha", "beta page"))
    (0 until 200).foreach { _ =>
      val b = base.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      val cut = if (rnd.nextBoolean()) b.take(1 + rnd.nextInt(b.length)) else b
      Pdf.extractText(cut) // must never throw
    }
  }

  test("parseToUnicode: bfchar, both bfrange forms, ligatures, code widths") {
    // bfrange increment form: <01>..<03> -> A B C (1-byte codes — the
    // simple-font shape)
    val inc = Pdf.parseToUnicode(
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<00> <FF>
        |endcodespacerange
        |1 beginbfrange
        |<01> <03> <0041>
        |endbfrange
        |endcmap""".stripMargin).get
    assert(inc.codeLen === 1)
    assert(inc.decode(Array[Byte](1, 2, 3)) === "ABC")
    assert(inc.decode(Array[Byte](1, 9, 3)) === "AC",
      "unmapped codes emit nothing — glyph ids must not leak")
    // bfrange ARRAY form + a multi-char (ligature) destination
    val arr = Pdf.parseToUnicode(
      """begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfrange
        |<0001> <0003> [<0066006600690020> <0058> <0059>]
        |endbfrange
        |2 beginbfchar
        |<0010> <0041>
        |<0011> <00E90151>
        |endbfchar
        |endcmap""".stripMargin).get
    assert(arr.codeLen === 2)
    assert(arr.decode(Array[Byte](0, 1)) === "ffi ", "ligature target intact")
    assert(arr.decode(Array[Byte](0, 2, 0, 3)) === "XY")
    assert(arr.decode(Array[Byte](0, 0x10, 0, 0x11)) === "Aéő")
    // garbage in, None out — never a throw
    assert(Pdf.parseToUnicode("no cmap here").isEmpty)
    assert(Pdf.parseToUnicode("beginbfchar <zz> <qq> endbfchar").isEmpty)
  }

  test("textOps font routing: Tf switches CMaps mid-stream; unmapped fonts keep the default") {
    val f1 = Pdf.ToUnicode(2, Map(1 -> "a", 2 -> "b"))
    val fonts = Map("F1" -> f1)
    // /F1 text decodes through the CMap; /F9 (no CMap) falls back to
    // the BOM/Latin-1 default mid-stream
    val got = Pdf.textOps(
      "BT /F1 12 Tf <00010002> Tj /F9 10 Tf (plain) Tj ET", fonts)
    assert(got === "abplain")
    // a font selected BEFORE BT still applies (Tf is text state)
    assert(Pdf.textOps("/F1 8 Tf BT <0002> Tj ET", fonts) === "b")
    // with no fonts at all, behavior is the pre-CMap default
    assert(Pdf.textOps("BT (x) Tj ET") === "x")
  }

  test("LZW decode matches the ISO 32000 worked example; encode/decode round-trip across width bumps") {
    // ISO 32000-1 table 7.4.4.2's example: decimal bytes
    // 45 45 45 45 45 65 45 45 45 66 encode (early change) to
    // 80 0B 60 50 22 0C 0C 85 01
    val plain = Array[Byte](45, 45, 45, 45, 45, 65, 45, 45, 45, 66)
    val encoded = Array(0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01)
      .map(_.toByte)
    assert(Pdf.lzwDecode(encoded).get.toSeq === plain.toSeq,
      "spec vector decodes exactly")
    assert(Pdf.lzwEncode(plain).toSeq === encoded.toSeq,
      "the encoder reproduces the spec vector bit for bit")
    // round-trip fuzz crossing the 9->10->11->12-bit boundaries and a
    // full-table clear: sizes chosen so the dictionary passes 511,
    // 1023, 2047 and 4096 entries
    val rnd = new scala.util.Random(59)
    Seq(10, 300, 2000, 9000, 40000).foreach { size =>
      val data = Array.fill[Byte](size)((rnd.nextInt(7) * 37).toByte)
      assert(Pdf.lzwDecode(Pdf.lzwEncode(data)).get.toSeq === data.toSeq,
        s"low-entropy round-trip at $size bytes")
      val hard = Array.fill[Byte](size)(rnd.nextInt(256).toByte)
      assert(Pdf.lzwDecode(Pdf.lzwEncode(hard)).get.toSeq === hard.toSeq,
        s"high-entropy round-trip at $size bytes")
    }
    // malformed: a code past the dictionary must refuse, not throw
    assert(Pdf.lzwDecode(Array.fill[Byte](6)(0xFF.toByte)).isEmpty)
  }

  test("synthesize(lzw) -> extractText: LZW-filtered content streams round-trip") {
    val hostile = Seq(
      "plain words only",
      "parens (nested (deep)) and \\ backslash",
      "beyond latin-1: ā中文 mixed ascii")
    hostile.foreach { page =>
      val r = Pdf.extractText(Pdf.synthesize(Seq(page), lzw = true))
      assert(r.ok && r.pages === 1 && r.text === page, s"page <$page>")
    }
    val r3 = Pdf.extractText(Pdf.synthesize(Seq("one", "two (2)", "three"),
      lzw = true))
    assert(r3.ok && r3.pages === 3 && r3.text === "one\ntwo (2)\nthree")
  }

  test("glyphToUnicode: uniXXXX forms, AGL subset, single letters, unknowns") {
    assert(Pdf.glyphToUnicode("uni00E1") === Some("á"))
    assert(Pdf.glyphToUnicode("uni00410042") === Some("AB"), "ligature form")
    assert(Pdf.glyphToUnicode("u1F600").map(_.codePointAt(0)) === Some(0x1F600),
      "uXXXXX reaches beyond the BMP")
    assert(Pdf.glyphToUnicode("ntilde") === Some("ñ"))
    assert(Pdf.glyphToUnicode("guillemotleft") === Some("«"))
    assert(Pdf.glyphToUnicode("a") === Some("a"))
    assert(Pdf.glyphToUnicode("Q") === Some("Q"))
    assert(Pdf.glyphToUnicode("g123456") === None, "unknown names map to nothing")
    assert(Pdf.glyphToUnicode("unixyzw") === None, "non-hex uni name rejected")
  }

  test("synthesizeDifferences -> extractText: shuffled /Encoding codes recover through glyph names only") {
    val hostile = Seq(
      "plain words only",
      "acentos: á é í ó ú ñ ü ¿qué? ¡sí!",
      "parens (nested) and \\ backslash")
    hostile.foreach { page =>
      val r = Pdf.extractText(Pdf.synthesizeDifferences(Seq(page)))
      assert(r.ok && r.pages === 1 && r.text === page, s"page <$page>")
    }
    val r3 = Pdf.extractText(
      Pdf.synthesizeDifferences(Seq("uno", "dos (2)", "tres")))
    assert(r3.ok && r3.pages === 3 && r3.text === "uno\ndos (2)\ntres")
    // the bytes on disk are SHUFFLED codes: the lexical scan (no
    // resource tree) must not see the words
    val bytes = Pdf.synthesizeDifferences(Seq("recoverable words"))
    val inflater = new java.util.zip.Inflater()
    try {
      val lex = Pdf.extractLexical(new String(bytes, Latin1), bytes, inflater)
      assert(!lex.text.contains("recoverable"),
        s"lexical scan must not see through the overlay: <${lex.text}>")
    } finally inflater.end()
    assert(Pdf.extractText(bytes).text === "recoverable words")
  }

  test("synthesizeEncrypted -> extractText: RC4 owner-locked docs decrypt; tampered/AES docs read unreadable") {
    val hostile = Seq(
      "plain words only",
      "parens (nested (deep)) and \\ backslash",
      "beyond latin-1: ā中文 mixed ascii")
    hostile.foreach { page =>
      val r = Pdf.extractText(Pdf.synthesizeEncrypted(Seq(page)))
      assert(r.ok && r.pages === 1 && r.text === page, s"page <$page>")
    }
    val r3 = Pdf.extractText(
      Pdf.synthesizeEncrypted(Seq("one", "two (2)", "three"), ownerPw = "x"))
    assert(r3.ok && r3.pages === 3 && r3.text === "one\ntwo (2)\nthree")
    // nothing readable on disk: the deflate magic of every content
    // stream is RC4'd away, so the lexical scan finds no text at all
    val bytes = Pdf.synthesizeEncrypted(Seq("recoverable words"))
    assert(!new String(bytes, Latin1).contains("recoverable"))
    // a tampered /U (≈ a user-passworded document) must refuse as
    // UNREADABLE — ok=false, empty — never lex ciphertext into text
    val raw = new String(bytes, Latin1)
    val uAt = raw.indexOf("/U <") + 4
    val tampered = bytes.clone()
    tampered(uAt) = (if (bytes(uAt) == '0') '1' else '0').toByte
    val rt = Pdf.extractText(tampered)
    assert(!rt.ok && rt.text === "" && rt.pages === 0,
      "wrong-password documents are unreadable, not garbage")
    // a V4 marker with NO /CF crypt-filter dict (malformed AES
    // envelope) must still refuse — never guess a cipher
    val aes = new String(bytes, Latin1).replace("/V 2 /R 3", "/V 4 /R 4")
    val ra = Pdf.extractText(aes.getBytes(Latin1))
    assert(!ra.ok && ra.text === "",
      "a crypt-filter-less V4 dict is out of envelope and refuses loudly")
  }

  test("synthesizeEncrypted aesv2/aesv3 -> extractText: AES docs decrypt; tampered /U or /UE read unreadable") {
    val hostile = Seq(
      "plain words only",
      "parens (nested (deep)) and \\ backslash",
      "beyond latin-1: ā中文 mixed ascii")
    for (mode <- Seq("aesv2", "aesv3")) {
      hostile.foreach { page =>
        val r = Pdf.extractText(Pdf.synthesizeEncrypted(Seq(page), mode = mode))
        assert(r.ok && r.pages === 1 && r.text === page, s"$mode page <$page>")
      }
      val r3 = Pdf.extractText(Pdf.synthesizeEncrypted(
        Seq("one", "two (2)", "three"), ownerPw = "x", mode = mode))
      assert(r3.ok && r3.pages === 3 && r3.text === "one\ntwo (2)\nthree", mode)
      // nothing readable on disk — every content stream is AES-CBC
      // ciphertext behind a random-looking IV
      val bytes = Pdf.synthesizeEncrypted(Seq("recoverable words"), mode = mode)
      assert(!new String(bytes, Latin1).contains("recoverable"), mode)
      // tampering the password-verification entry (/U hash) must
      // refuse as UNREADABLE — ok=false, empty — never ciphertext
      val raw = new String(bytes, Latin1)
      val uAt = raw.indexOf("/U <") + 4
      val tampered = bytes.clone()
      tampered(uAt) = (if (bytes(uAt) == '0') '1' else '0').toByte
      val rt = Pdf.extractText(tampered)
      assert(!rt.ok && rt.text === "" && rt.pages === 0,
        s"$mode: tampered /U documents are unreadable, not garbage")
    }
    // aesv2 with /EncryptMetadata false: the file key folds the flag
    // into its digest — the reader's both-shapes probe must find it
    val metaFalse = Pdf.synthesizeEncrypted(Seq("meta off words"),
      mode = "aesv2", encryptMeta = false)
    assert(new String(metaFalse, Latin1).contains("/EncryptMetadata false"))
    val rm = Pdf.extractText(metaFalse)
    assert(rm.ok && rm.text === "meta off words",
      "the EncryptMetadata-false key shape must verify and decrypt")
    // aesv3: a corrupted key-wrap (/UE) verifies /U but yields a
    // wrong file key — streams fail CBC padding and decode empty,
    // and the encrypted guard keeps the lexical scan off the bytes
    val v3 = Pdf.synthesizeEncrypted(Seq("secret text"), mode = "aesv3")
    val raw3 = new String(v3, Latin1)
    val ueAt = raw3.indexOf("/UE <") + 5
    val t3 = v3.clone()
    t3(ueAt) = (if (v3(ueAt) == '0') '1' else '0').toByte
    val rt3 = Pdf.extractText(t3)
    assert(rt3.text === "" && rt3.pages === 0,
      "a corrupted /UE never surfaces ciphertext as text")
  }

  test("never lex ciphertext: encrypted docs whose walk fails read unreadable, not garbage") {
    for (mode <- Seq("rc4", "aesv2", "aesv3")) {
      val bytes = Pdf.synthesizeEncrypted(Seq("hidden words"), mode = mode)
      val raw = new String(bytes, Latin1)
      // corrupt the startxref offset: the walk can't load any trailer,
      // but the raw /Encrypt token must still suppress the lexical scan
      val sx = raw.lastIndexOf("startxref")
      val broken = raw.substring(0, sx) + "startxref\n999999999\n%%EOF\n"
      val rb = Pdf.extractText(broken.getBytes(Latin1))
      assert(!rb.ok && rb.text === "",
        s"$mode: a broken-xref encrypted doc must not be lexed")
      // a VERIFIED key whose page tree yields no text (all-empty
      // pages ≈ image-only scans) also refuses the lexical fallback
      val empty = Pdf.extractText(Pdf.synthesizeEncrypted(Seq(""), mode = mode))
      assert(!empty.ok && empty.text === "",
        s"$mode: a no-text encrypted doc reads honest-empty")
    }
  }

  test("predefined Identity-H CMap: Type0 fonts without /ToUnicode decode codes as UTF-16BE") {
    val pages = Seq("plain ascii words", "beyond latin-1: ā中文 αΩ жЯ €“")
    val bytes = Pdf.synthesizeCid(pages, predefined = true)
    // nothing Latin-1-readable on disk (2-byte hex codes only), and
    // the lexical scan cannot see through the encoding
    assert(!new String(bytes, Latin1).contains("plain ascii"))
    val inflater = new java.util.zip.Inflater()
    try {
      val lex = Pdf.extractLexical(new String(bytes, Latin1), bytes, inflater)
      assert(!lex.text.contains("plain ascii"),
        s"lexical scan must not see through Identity-H: <${lex.text}>")
    } finally inflater.end()
    val r = Pdf.extractText(bytes)
    assert(r.ok && r.pages === 2 && r.text === pages.mkString("\n"))
  }

  test("registry CMaps without /ToUnicode extract honest-empty, never mojibake") {
    // same fixture, but the font names a registry CMap whose
    // CID->Unicode table we do not bundle: the document reads ok with
    // EMPTY text — the 2-byte codes must not leak through any path
    val bytes = Pdf.synthesizeCid(Seq("untranslatable codes"), predefined = true)
    // same-length name swap so the xref offsets stay valid
    val swapped = new String(bytes, Latin1)
      .replace("/Encoding /Identity-H", "/Encoding /UniKS-UCS2")
    val r = Pdf.extractText(swapped.getBytes(Latin1))
    assert(r.ok && r.text === "" && r.pages === 0,
      s"registry-CMap codes must extract empty, got <${r.text}>")
  }

  test("registry UCS2/UTF16 CMaps decode exactly: their code space IS Unicode") {
    // UniGB-UCS2-H / UniJIS-UCS2-HW-V / UniKS-UTF16-H etc. define
    // their 2-byte codes AS UCS-2/UTF-16BE units (the CMap only maps
    // them to collection CIDs for glyph selection) — extraction is a
    // table-free passthrough, and CJK text must round-trip exactly
    val pages = Seq("mixed ascii and 漢字中文텍스트", "page 2 日本語")
    Seq("UniGB-UCS2-H", "UniJIS-UCS2-HW-V", "UniKS-UTF16-H",
      "UniCNS-UTF16-V", "UniJIS2004-UTF16-H").foreach { enc =>
      val bytes = Pdf.synthesizeCid(pages, predefined = true, registry = enc)
      assert(!new String(bytes, Latin1).contains("mixed ascii"))
      val r = Pdf.extractText(bytes)
      assert(r.ok && r.pages === 2 && r.text === pages.mkString("\n"),
        s"$enc must decode as UTF-16BE passthrough, got <${r.text}>")
    }
  }

  test("registry UTF16 CMaps compose surrogate pairs across adjacent codes") {
    val pages = Seq("emoji plane: 😀 and 𝄞 done")
    val bytes = Pdf.synthesizeCid(pages, predefined = true,
      registry = "UniGB-UTF16-H")
    val r = Pdf.extractText(bytes)
    assert(r.ok && r.text === pages.head,
      s"surrogate pairs must survive the 2-byte code stream: <${r.text}>")
  }

  test("non-Unicode and non-2-byte registry CMaps stay honest-empty") {
    // GBK-EUC-H codes are GBK bytes; UniGB-UTF32-H codes are 4-byte
    // UTF-32BE — reading either as UCS-2 would FABRICATE text, so
    // both must take the honest-empty path (ok, zero pages, no text)
    Seq("GBK-EUC-H", "UniGB-UTF32-H", "UniGB-UTF8-H", "B5pc-H").foreach { enc =>
      val bytes = Pdf.synthesizeCid(Seq("never surfaced 中文"),
        predefined = true, registry = enc)
      val r = Pdf.extractText(bytes)
      assert(r.ok && r.text === "" && r.pages === 0,
        s"$enc must extract honest-empty, got <${r.text}>")
    }
  }

  test("glyphToUnicode: AGL Greek/Cyrillic/punctuation rows (table test)") {
    val cases = Seq(
      "alpha" -> "α", "beta" -> "β", "Omega" -> "Ω", "Sigma" -> "Σ",
      "sigma" -> "σ", "sigma1" -> "ς", "rho" -> "ρ", "tau" -> "τ",
      "omega" -> "ω", "Alpha" -> "Α", "Rho" -> "Ρ", "alphatonos" -> "ά",
      "afii10017" -> "А", "afii10023" -> "Ё", "afii10049" -> "Я",
      "afii10065" -> "а", "afii10071" -> "ё", "afii10097" -> "я",
      "afii10037" -> "У", "afii10085" -> "у",
      "Euro" -> "€", "dagger" -> "†", "perthousand" -> "‰",
      "trademark" -> "™", "copyright" -> "©", "section" -> "§",
      "onehalf" -> "½", "germandbls" -> "ß", "oe" -> "œ", "AE" -> "Æ",
      "Lslash" -> "Ł", "scaron" -> "š", "quotesinglbase" -> "‚",
      "guilsinglleft" -> "‹", "minus" -> "−", "multiply" -> "×")
    cases.foreach { case (name, expect) =>
      assert(Pdf.glyphToUnicode(name) === Some(expect), s"/$name")
    }
    // unknown names still yield None (base encoding wins, no mojibake)
    assert(Pdf.glyphToUnicode("afii99999") === None)
    assert(Pdf.glyphToUnicode("notaglyphname") === None)
  }

  test("fuzz: encrypted/differences/lzw layouts are total under mutation and truncation") {
    val rnd = new scala.util.Random(61)
    Seq(Pdf.synthesizeEncrypted(Seq("mutation alpha", "beta")),
      Pdf.synthesizeEncrypted(Seq("mutation alpha", "beta"), mode = "aesv2"),
      Pdf.synthesizeEncrypted(Seq("mutation alpha", "beta"), mode = "aesv3"),
      Pdf.synthesizeCid(Seq("mutation alpha", "beta"), predefined = true),
      Pdf.synthesizeDifferences(Seq("mutation alpha", "beta")),
      Pdf.synthesize(Seq("mutation alpha", "beta"), lzw = true))
      .foreach { base =>
        (0 until 120).foreach { _ =>
          val b = base.clone()
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          val cut = if (rnd.nextBoolean()) b.take(1 + rnd.nextInt(b.length)) else b
          Pdf.extractText(cut) // must never throw
        }
      }
  }

  test("classic incremental update: /Prev chain resolves newest-wins") {
    // base doc, then an appended update replacing the content stream
    // (object 4) plus a new xref section whose trailer /Prev points at
    // the original table — the standard save-in-place layout.
    val base = Pdf.synthesize(Seq("old page"))
    val baseStr = new String(base, Latin1)
    val oldXref = baseStr.lastIndexOf("xref\n0 ") // NOT the "xref" inside "startxref"
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    val newContent = deflate("BT (new page) Tj ET".getBytes(Latin1))
    val objOff = out.size()
    out.write((s"4 0 obj << /Length ${newContent.length} /Filter /FlateDecode >> stream\n")
      .getBytes(Latin1))
    out.write(newContent)
    out.write("\nendstream endobj\n".getBytes(Latin1))
    val xrefOff = out.size()
    out.write((s"xref\n4 1\n${"%010d".format(objOff)} 00000 n \n" +
      s"trailer << /Size 5 /Root 1 0 R /Prev $oldXref >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n").getBytes(Latin1))
    val r = Pdf.extractText(out.toByteArray)
    assert(r.ok && r.pages === 1 && r.text === "new page")
  }

  test("unpredict: TIFF and all five PNG filters invert their encoders") {
    val rnd = new scala.util.Random(7)
    val rowLen = 5
    val nRows = 8
    val plain = Array.tabulate[Byte](nRows * rowLen)(_ => rnd.nextInt(256).toByte)
    // PNG: encode each row with filter f, decode with unpredict
    for (f <- 0 to 4) {
      val enc = new Array[Byte](nRows * (rowLen + 1))
      for (r <- 0 until nRows) {
        enc(r * (rowLen + 1)) = f.toByte
        for (i <- 0 until rowLen) {
          val x = plain(r * rowLen + i) & 0xFF
          val left = if (i >= 1) plain(r * rowLen + i - 1) & 0xFF else 0
          val up = if (r >= 1) plain((r - 1) * rowLen + i) & 0xFF else 0
          val ul = if (i >= 1 && r >= 1) plain((r - 1) * rowLen + i - 1) & 0xFF else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          }
          enc(r * (rowLen + 1) + 1 + i) = ((x - pred) & 0xFF).toByte
        }
      }
      assert(Pdf.unpredict(enc, 10 + f, rowLen).toSeq === plain.toSeq, s"PNG filter $f")
    }
    // TIFF predictor 2: encode = per-row byte diffs
    val tiff = plain.clone()
    for (r <- 0 until nRows; i <- (rowLen - 1) to 1 by -1)
      tiff(r * rowLen + i) = (tiff(r * rowLen + i) - tiff(r * rowLen + i - 1)).toByte
    assert(Pdf.unpredict(tiff, 2, rowLen).toSeq === plain.toSeq, "TIFF predictor")
  }

  test("fuzz: modern layout is total under noise, mutation, and truncation") {
    val rnd = new scala.util.Random(43)
    val base = Pdf.synthesizeModern(Seq("fuzz page one", "and (two)", "three äß"))
    for (_ <- 1 to 40) {
      val b = base.clone()
      for (_ <- 0 to rnd.nextInt(24)) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      assert(Pdf.extractText(b).text != null)
    }
    for (cut <- 1 until base.length by math.max(1, base.length / 80)) {
      assert(Pdf.extractText(base.take(cut)).text != null)
    }
    // corrupt ONLY the xref payload region: the walk must fail closed
    // into the lexical fallback, never throw
    val raw = new String(base, Latin1)
    val xrefObjAt = raw.lastIndexOf(" 0 obj << /Type /XRef")
    for (_ <- 1 to 20) {
      val b = base.clone()
      for (_ <- 0 to 8) {
        val p = xrefObjAt + rnd.nextInt(base.length - xrefObjAt)
        b(p) = rnd.nextInt(256).toByte
      }
      assert(Pdf.extractText(b).text != null)
    }
  }

  test("writePdfDir + readPdfDir: distributed generate/parse round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pdf-w").toString + "/out"
    val rows = spark.range(0, 12).as[Long]
      .map(i => (f"doc_$i%04d", Seq(s"body of document $i", s"doc $i page 2")))
    Pdf.writePdfDir(rows, dir)
    val out = Pdf.readPdfDir(spark, dir).collect()
    assert(out.length === 12)
    out.foreach { e =>
      val id = new java.io.File(e.path).getName.stripPrefix("doc_")
        .stripSuffix(".pdf").toInt
      assert(e.pdf_ok && e.pdf_pages === 2)
      assert(e.pdf_text === s"body of document $id\ndoc $id page 2")
    }
    // overwrite semantics: a second write replaces, never accumulates
    Pdf.writePdfDir(rows.filter(_._1 < "doc_0006"), dir)
    assert(Pdf.readPdfDir(spark, dir).count() === 6)
  }

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("pdfHash2B known-answer vectors (external: independent Python " +
      "hashlib+cryptography implementation of ISO 32000-2 Algorithm 2.B)") {
    // Literal expected bytes below were generated OUTSIDE this codebase by
    // a second implementation written directly from the published
    // pseudocode (qpdf's hash_V5 / pdfminer's Algorithm-2.B loop:
    // round_number pre-incremented, stop iff rounds >= 64 and
    // E.last <= rounds - 32), in Python over hashlib + pyca/cryptography.
    // The writer (synthesizeEncrypted) and reader share pdfHash2B, so a
    // self-consistent bug would still round-trip — these vectors are the
    // independent check. The "boundary" row terminates with
    // E.last == rounds - 32 exactly (rounds=68): the historical
    // `<= i - 32` off-by-one ran one extra round on exactly this shape
    // and produced a different hash.
    val pwUser = "user".getBytes(Latin1)
    val vectors = Seq(
      ("r6 basic", pwUser, unhex("0001020304050607"), Array.empty[Byte], 6,
        "731758c09c8b0160a34721d18bdd24220abada0070aa3f05b8103fd5b8d05f17"),
      ("r6 with udata", "owner".getBytes(Latin1), unhex("08090a0b0c0d0e0f"),
        (0 until 48).map(_.toByte).toArray, 6,
        "400c13628b144fe2fbb850b65729e9ecb63c00fbb817c685725f25de85af0521"),
      ("r6 empty pw", Array.empty[Byte], unhex("deadbeef01020304"),
        Array.empty[Byte], 6,
        "c99f2e6935d3c5db3330ab88cb17b3c0b05c5efb808955c997c54c95a9110772"),
      ("r6 boundary rounds=68 lastE=36", pwUser, unhex("f503baeea6a0ee68"),
        Array.empty[Byte], 6,
        "43f94370d0d325def53577fc707abd94fceef082a41cceb31501909380a51e8f"),
      ("r5 plain sha-256", pwUser, unhex("0001020304050607"),
        Array.empty[Byte], 5,
        "f90940351d2eddc7a5d9bf15695a020054f9854261486d8a51767ad0089e4c26"))
    for ((name, pw, salt, udata, r, want) <- vectors)
      assert(hex(Pdf.pdfHash2B(pw, salt, udata, r)) === want, name)
  }

  test("per-object key derivation + /U known-answer vectors (external)") {
    // Same provenance as above: independent Python implementation of
    // ISO 32000 Algorithm 1 (MD5 of key||num_le3||gen_le2, AES filters
    // append the mandated 0x73 0x41 0x6C 0x54) and Algorithms 4/5 (/U).
    val fkey16 = (0 until 16).map(_.toByte).toArray
    val fkey5 = Array[Byte](1, 2, 3, 4, 5)
    assert(hex(Pdf.pdfObjKeyAes(fkey16, 7, 0)) ===
      "8be05f4432358a80b1989cd329ba6e21")
    assert(hex(Pdf.pdfObjKeyAes(fkey16, 300, 2)) ===
      "96edc5261782b6e168920c5fa5421f3f")
    assert(hex(Pdf.pdfObjKeyAes(fkey5, 7, 0)) === "c56ef98308a4fccb5430")
    assert(hex(Pdf.pdfObjKey(fkey16, 7, 0)) ===
      "8d0ca33b06a706a98dd4116373447883")
    assert(hex(Pdf.pdfObjKey(fkey5, 300, 2)) === "2e432e093ebbcd8191e0")
    val id0 = (0 until 16).map(_.toByte).toArray
    assert(hex(Pdf.pdfUserU(fkey16, id0, 3)) ===
      "8f605afd79ac56b021f1d348e5796b7c00000000000000000000000000000000")
    assert(hex(Pdf.pdfUserU(fkey5, id0, 2)) ===
      "9a862d5bbe484a66a8c31c1cf5eb19a047ac94f9c894bc55a6c8aa5a1e5e6063")
  }
}
