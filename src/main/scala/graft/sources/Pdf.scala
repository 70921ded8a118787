package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** PDF text-extraction source (SURVEY §2.1 S14) — the engine-native
  * counterpart of the reference's pdfplumber page loop
  * (/root/reference/scripts/gemini_distiller.py:72-82: page texts
  * joined by newline, extraction failure → empty string;
  * pipeline/ingestion/drivers.py:33-50 lands the raw bytes in bronze,
  * which [[graft.operators.Multimodal.readBinaryDir]] already reads).
  *
  * The extractor is a self-contained content-stream parser, pure JVM:
  *   - object streams are located lexically (`<<dict>> stream ...
  *     endstream`), `/FlateDecode` streams inflated with
  *     `java.util.zip.Inflater` (the JDK codec — no external library);
  *   - text shows between `BT`/`ET`: literal `(...)` strings (octal +
  *     character escapes, nested parens, line continuations) and hex
  *     `<...>` strings, consumed by `Tj`/`'`/`"`/`TJ`; `Td`/`TD`/`T*`
  *     and the quote operators break lines; a TJ kerning gap below
  *     −180/1000 em renders as a space (the word-gap heuristic);
  *   - strings with a UTF-16BE BOM decode as UTF-16BE, everything
  *     else as Latin-1 (≈PDFDocEncoding for the ASCII range).
  *
  * Documented limits (the "simple PDFs" envelope): no xref/object
  * graph walk (streams are taken in file order, so `pdf_pages` counts
  * text-bearing content streams), no font CMap/ToUnicode mapping
  * (custom-encoded fonts extract as their raw codes), no encryption.
  * A malformed file extracts as `ok = false` with empty text — the
  * reference's empty-on-error contract — never an exception.
  *
  * Scale shape: extraction runs in `mapPartitions` with ONE Inflater
  * per partition (codec init amortized, the [[graft.operators
  * .Multimodal]] batch stance); bytes never hit the driver; the
  * output is (path, text) — the downstream corpus operators take over
  * from there.
  */
object Pdf {

  final case class PdfDoc(path: String, content: Array[Byte])
  final case class PdfExtract(
      path: String, pdf_text: String, pdf_pages: Int, pdf_ok: Boolean)

  /** Directory of PDFs → extracted text, one row per file. */
  def readPdfDir(spark: SparkSession, path: String,
      glob: String = "*.pdf"): Dataset[PdfExtract] = {
    import spark.implicits._
    val raw = graft.operators.Multimodal.readBinaryDir(spark, path, glob)
      .select(col("path"), col("content")).as[PdfDoc]
    extractAll(raw)
  }

  /** Batch extraction over (path, content) rows. */
  def extractAll(docs: Dataset[PdfDoc]): Dataset[PdfExtract] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { rows =>
      val inflater = new java.util.zip.Inflater()
      // release the native zlib buffers when the TASK completes —
      // covers full drains, limit()/take() short-circuits, and task
      // failure alike (an iterator-drain hook misses the latter two);
      // executors churn many tasks and GC finalization is too late
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => inflater.end()))
      rows.map { d =>
        val r = extractText(d.content, inflater)
        PdfExtract(d.path, r.text, r.pages, r.ok)
      }
    }
  }

  final case class Extracted(text: String, pages: Int, ok: Boolean)

  /** Single-document extraction (driver-side / test entry). */
  def extractText(bytes: Array[Byte]): Extracted = {
    val inflater = new java.util.zip.Inflater()
    try extractText(bytes, inflater) finally inflater.end()
  }

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  def extractText(bytes: Array[Byte], inflater: java.util.zip.Inflater): Extracted = {
    try {
      val raw = new String(bytes, Latin1)
      if (!raw.startsWith("%PDF")) return Extracted("", 0, ok = false)
      // a parse error in ONE stream (binary data that happens to lex
      // as text operators, a malformed number) skips that stream —
      // never the other 99 pages of the document
      val pageTexts = streams(raw, bytes, inflater).flatMap { data =>
        val t =
          try textOps(new String(data, Latin1))
          catch { case scala.util.control.NonFatal(_) => "" }
        if (t.nonEmpty) Some(t) else None
      }
      Extracted(pageTexts.mkString("\n"), pageTexts.length, ok = true)
    } catch {
      case scala.util.control.NonFatal(_) => Extracted("", 0, ok = false)
    }
  }

  /** Lexical stream scan: every `<<dict>> stream\r?\n ... endstream`,
    * inflated when the dict names FlateDecode. Undecodable streams
    * are skipped, not fatal (a real corpus has image XObjects the
    * text pass must step over). */
  private def streams(raw: String, bytes: Array[Byte],
      inflater: java.util.zip.Inflater): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var s = raw.indexOf("stream")
    while (s >= 0) {
      // require the keyword, not a substring of "endstream"
      val isKeyword = s < 3 || !raw.regionMatches(s - 3, "end", 0, 3)
      if (!isKeyword) { s = raw.indexOf("stream", s + 6) }
      else {
        val dataStart = {
          var p = s + "stream".length
          if (p < raw.length && raw.charAt(p) == '\r') p += 1
          if (p < raw.length && raw.charAt(p) == '\n') p += 1
          p
        }
        val e = raw.indexOf("endstream", dataStart)
        if (e < 0) { s = -1 }
        else {
          var dataEnd = e
          if (dataEnd > dataStart && raw.charAt(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && raw.charAt(dataEnd - 1) == '\r') dataEnd -= 1
          val dict = dictBefore(raw, s)
          val data = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          if (dict.contains("/FlateDecode")) inflate(data, inflater).foreach(out += _)
          else out += data
          s = raw.indexOf("stream", e + "endstream".length)
        }
      }
    }
    out.result()
  }

  /** The full `<< ... >>` dictionary text preceding position `s`,
    * balancing nested dictionaries — `lastIndexOf("<<")` would land
    * on an inner `/DecodeParms << ... >>` and miss the outer dict's
    * /Filter entry. Scans FORWARD from the stream's object header
    * (the `obj` keyword — the natural restart point where no string
    * can be open) walking strings/hex/comments structurally, so a
    * `>>` inside a `(Title (a >> b))` value can never misbalance the
    * depth the way a naive backward bracket count would. The anchor
    * must be a DELIMITED `obj` token — a bare substring match would
    * anchor inside a string value like `(An object summary)` and
    * start the structural scan mid-string. Empty when no complete
    * dict closes before `s`. */
  private def dictBefore(raw: String, s: Int): String = {
    def delimitedToken(p: Int): Boolean =
      p >= 0 &&
        (p == 0 || !raw.charAt(p - 1).isLetter) &&
        (p + 3 >= raw.length || !raw.charAt(p + 3).isLetterOrDigit)
    var objPos = raw.lastIndexOf("obj", s)
    while (objPos >= 0 && !delimitedToken(objPos))
      objPos = raw.lastIndexOf("obj", objPos - 1)
    var i = if (objPos >= 0) objPos + 3 else math.max(0, s - 8192)
    var depth = 0
    var start = -1
    var doneStart = -1
    var doneEnd = -1
    while (i < s) {
      val c = raw.charAt(i)
      if (c == '%') {
        while (i < s && raw.charAt(i) != '\n' && raw.charAt(i) != '\r') i += 1
      } else if (c == '(') i = literalString(raw, i)._2
      else if (c == '<' && i + 1 < raw.length && raw.charAt(i + 1) == '<') {
        if (depth == 0) start = i
        depth += 1; i += 2
      } else if (c == '>' && i + 1 < raw.length && raw.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) { doneStart = start; doneEnd = i }
      } else if (c == '<') i = hexString(raw, i)._2
      else i += 1
    }
    if (doneStart >= 0) raw.substring(doneStart, doneEnd) else ""
  }

  private def inflate(data: Array[Byte],
      inflater: java.util.zip.Inflater): Option[Array[Byte]] =
    try {
      inflater.reset()
      inflater.setInput(data)
      val buf = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val chunk = new Array[Byte](8192)
      while (!inflater.finished() && !inflater.needsInput()) {
        val n = inflater.inflate(chunk)
        if (n > 0) buf.write(chunk, 0, n)
        else if (!inflater.finished()) return None // truncated/corrupt
      }
      if (inflater.finished()) Some(buf.toByteArray) else None
    } catch { case _: java.util.zip.DataFormatException => None }

  /** Text operators of one decoded content stream → extracted text.
    * Empty when the stream carries no BT/ET text (image data, fonts). */
  private[sources] def textOps(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inText = false
    var needNewline = false
    def emit(str: String): Unit = {
      if (needNewline && sb.nonEmpty) sb.append('\n')
      needNewline = false
      sb.append(str)
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') { // comment to end of line
        while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (!inText) {
        if (c == 'B' && s.regionMatches(i, "BT", 0, 2) && delimited(s, i, 2)) {
          inText = true; i += 2
        } else i += 1
      } else if (c == '(') {
        val (str, next) = literalString(s, i)
        i = next
        val op = nextToken(s, i)
        op._1 match {
          case "Tj" => emit(str); i = op._2
          case "'"  => needNewline = true; emit(str); i = op._2
          case "\"" => needNewline = true; emit(str); i = op._2
          case _    => // positioned string with no show op — ignore
        }
      } else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') {
        // inline dictionary (marked-content properties: `/P << /MCID 0 >> BDC`)
        // — skip it whole, or its body would lex as a hex string
        i = skipInlineDict(s, i)
      } else if (c == '<') {
        val (str, next) = hexString(s, i)
        i = next
        val op = nextToken(s, i)
        op._1 match {
          case "Tj" => emit(str); i = op._2
          case "'"  => needNewline = true; emit(str); i = op._2
          case "\"" => needNewline = true; emit(str); i = op._2
          case _    =>
        }
      } else if (c == '[') {
        val (str, next) = tjArray(s, i)
        i = next
        val op = nextToken(s, i)
        if (op._1 == "TJ") { emit(str); i = op._2 }
      } else if (c == 'E' && s.regionMatches(i, "ET", 0, 2) && delimited(s, i, 2)) {
        inText = false; needNewline = true; i += 2
      } else if ((c == 'T' && i + 1 < s.length &&
          (s.charAt(i + 1) == 'd' || s.charAt(i + 1) == 'D' || s.charAt(i + 1) == '*')
          && delimited(s, i, 2))) {
        needNewline = true; i += 2
      } else i += 1
    }
    // trim trailing blank space; internal newlines collapse to one
    sb.toString.replaceAll("\n+", "\n").trim
  }

  /** Skip a balanced `<< ... >>` inline dictionary starting at `i`;
    * returns the index just past the closing `>>` (end of input when
    * unbalanced). Nested dicts and strings inside the dict are walked
    * structurally so a `(...)`/`<...>` value can't derail the depth. */
  private def skipInlineDict(s: String, start: Int): Int = {
    var i = start + 2
    var depth = 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (c == '>' && i + 1 < s.length && s.charAt(i + 1) == '>') { depth -= 1; i += 2 }
      else if (c == '(') i = literalString(s, i)._2
      else if (c == '<') i = hexString(s, i)._2
      else i += 1
    }
    i
  }

  /** True when the 2-char token at `i` is not part of a longer name. */
  private def delimited(s: String, i: Int, len: Int): Boolean = {
    def boundary(c: Char) = !c.isLetterOrDigit && c != '*'
    (i == 0 || boundary(s.charAt(i - 1))) &&
      (i + len >= s.length || boundary(s.charAt(i + len)))
  }

  /** Next operator-ish token after optional whitespace, as
    * (token, index after it); empty token at end of input. */
  private def nextToken(s: String, start: Int): (String, Int) = {
    var i = start
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length) return ("", i)
    val c = s.charAt(i)
    if (c == '\'' || c == '"') return (c.toString, i + 1)
    val b = i
    while (i < s.length && (s.charAt(i).isLetter || s.charAt(i) == '*')) i += 1
    (s.substring(b, i), i)
  }

  /** PDF literal string starting at `(`: returns (decoded, index after
    * the closing paren). Handles nesting, escapes, octal, and
    * backslash line continuation. */
  private[sources] def literalString(s: String, start: Int): (String, Int) = {
    val bytes = new java.io.ByteArrayOutputStream()
    var i = start + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        val e = s.charAt(i + 1)
        e match {
          case 'n' => bytes.write('\n'); i += 2
          case 'r' => bytes.write('\r'); i += 2
          case 't' => bytes.write('\t'); i += 2
          case 'b' => bytes.write('\b'); i += 2
          case 'f' => bytes.write('\f'); i += 2
          case '(' => bytes.write('('); i += 2
          case ')' => bytes.write(')'); i += 2
          case '\\' => bytes.write('\\'); i += 2
          case '\r' => i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
          case '\n' => i += 2 // line continuation
          case d if d >= '0' && d <= '7' =>
            var v = 0; var n = 0; i += 1
            while (n < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
              v = v * 8 + (s.charAt(i) - '0'); i += 1; n += 1
            }
            bytes.write(v & 0xFF)
          case other => bytes.write(other.toInt & 0xFF); i += 2
        }
      } else if (c == '(') { depth += 1; bytes.write('('); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) bytes.write(')')
        i += 1
      } else { bytes.write(c.toInt & 0xFF); i += 1 }
    }
    (decodeString(bytes.toByteArray), i)
  }

  /** PDF hex string starting at `<`: returns (decoded, index after `>`). */
  private[sources] def hexString(s: String, start: Int): (String, Int) = {
    var i = start + 1
    val hex = new StringBuilder
    while (i < s.length && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (!c.isWhitespace) hex.append(c)
      i += 1
    }
    if (hex.length % 2 == 1) hex.append('0') // odd count pads with 0
    val out = new Array[Byte](hex.length / 2)
    var j = 0
    while (j < out.length) {
      out(j) = Integer.parseInt(hex.substring(2 * j, 2 * j + 2), 16).toByte
      j += 1
    }
    (decodeString(out), i + 1)
  }

  /** UTF-16BE when BOM'd, Latin-1 (≈PDFDocEncoding) otherwise. */
  private def decodeString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
      new String(b, 2, b.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
    else new String(b, Latin1)

  /** `[(a) -250 (b)] TJ` array: strings concatenated; a kerning value
    * below −180 (thousandths of an em) renders as a word gap. */
  private[sources] def tjArray(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    while (i < s.length && s.charAt(i) != ']') {
      val c = s.charAt(i)
      if (c == '(') {
        val (str, next) = literalString(s, i); sb.append(str); i = next
      } else if (c == '<') {
        val (str, next) = hexString(s, i); sb.append(str); i = next
      } else if (c == '-' || c.isDigit) {
        val b = i
        i += 1
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        // malformed numbers ("1.2.3", a lone "-") are no-ops, not fatal
        val v = try s.substring(b, i).toDouble catch {
          case _: NumberFormatException => 0.0
        }
        if (v < -180) sb.append(' ')
      } else i += 1
    }
    (sb.toString, math.min(i + 1, s.length))
  }

  // ======== deterministic PDF synthesis (fixture / round-trip
  // generation — the write half that lets the extractor be checked
  // end-to-end against source-of-truth text, q142) ========

  /** One PDF literal/hex string for `s`, chosen so extraction inverts
    * it exactly: all-Latin-1 text becomes an escaped `(...)` literal
    * (backslash/parens escaped, control + high bytes as octal);
    * anything wider becomes a BOM'd UTF-16BE `<...>` hex string. */
  private[sources] def pdfString(s: String): String =
    if (s.forall(_ <= 0xFF)) {
      val b = new StringBuilder("(")
      s.foreach {
        case '\\' => b.append("\\\\")
        case '(' => b.append("\\(")
        case ')' => b.append("\\)")
        case c if c >= 32 && c <= 126 => b.append(c)
        case c => b.append("\\%03o".format(c.toInt))
      }
      b.append(")").toString
    } else {
      val bytes = ("\uFEFF" + s).getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
      bytes.map("%02X".format(_)).mkString("<", "", ">")
    }

  private def deflateBytes(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** A complete single-file PDF with one FlateDecode content stream
    * per page (catalog → page tree → page objects → streams, plus a
    * correct xref table, so any conforming reader opens it — not just
    * this extractor's lexical scan). Deterministic: same pages, same
    * bytes, on any JVM (JDK Deflater with default settings).
    * Guarantee the oracle leans on (q142, PdfSpec round-trip fuzz):
    * extraction inverts synthesis up to the extractor's per-stream
    * normalization — each page comes back `trim`med with newline runs
    * collapsed, and blank pages drop from the count. Pages free of
    * edge whitespace and newline runs (every documents-table text)
    * round-trip EXACTLY:
    * `extractText(synthesize(pages)).text == pages.mkString("\n")`. */
  def synthesize(pages: Seq[String]): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val out = new java.io.ByteArrayOutputStream()
    val offsets = new Array[Int](2 * n + 3) // 1-based object offsets
    def w(s: String): Unit = out.write(s.getBytes(Latin1))
    w("%PDF-1.4\n")
    offsets(1) = out.size()
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets(2) = out.size()
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
    pages.indices.foreach { i =>
      offsets(3 + i) = out.size()
      w(s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents ${3 + n + i} 0 R >> endobj\n")
    }
    pages.zipWithIndex.foreach { case (text, i) =>
      val content = deflateBytes(
        s"BT /F1 12 Tf 72 720 Td ${pdfString(text)} Tj ET".getBytes(Latin1))
      offsets(3 + n + i) = out.size()
      w(s"${3 + n + i} 0 obj << /Length ${content.length} " +
        "/Filter /FlateDecode >> stream\n")
      out.write(content)
      w("\nendstream endobj\n")
    }
    val xref = out.size()
    w(s"xref\n0 ${2 * n + 3}\n0000000000 65535 f \n")
    (1 until 2 * n + 3).foreach(i => w("%010d 00000 n \n".format(offsets(i))))
    w(s"trailer << /Size ${2 * n + 3} /Root 1 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** Distributed fixture/export writer: one synthesized PDF per input
    * row into `dir` as `<name>.pdf`. Files are written executor-side
    * through the Hadoop FS API (works on local paths and HDFS alike);
    * bytes never hit the driver. Input: (name, pages). */
  def writePdfDir(rows: Dataset[(String, Seq[String])], dir: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fsSetup = hp.getFileSystem(
      rows.sparkSession.sessionState.newHadoopConf())
    fsSetup.delete(hp, true)
    fsSetup.mkdirs(hp)
    // spread before the write: a single-row-group upstream scan would
    // otherwise synthesize every file on one core (the round-2 gotcha)
    val par = rows.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (rows.rdd.getNumPartitions < math.max(2, par / 2)) rows.repartition(par)
      else rows
    // ship the SESSION's effective Hadoop conf to the executors — a
    // bare `new Configuration()` there would drop spark.hadoop.*
    // settings (object-store credentials, fs.defaultFS), silently
    // writing against the wrong filesystem
    val confKv: Array[(String, String)] = {
      import scala.jdk.CollectionConverters._
      fsSetup.getConf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    }
    spread.foreachPartition { it: Iterator[(String, Seq[String])] =>
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confKv.foreach { case (k, v) => conf.set(k, v) }
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      it.foreach { case (name, pages) =>
        val os = fs.create(new org.apache.hadoop.fs.Path(dir, s"$name.pdf"), true)
        try os.write(synthesize(pages)) finally os.close()
      }
    }
  }
}
