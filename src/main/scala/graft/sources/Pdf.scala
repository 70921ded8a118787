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
  * Extraction is STRUCTURED-FIRST: a real cross-reference walk
  * (classic `xref` tables, PDF 1.5 cross-reference STREAMS with PNG
  * predictors, `/Prev` incremental-update chains with newest-wins
  * entries, hybrid `/XRefStm` trailers) resolves the catalog → page
  * tree → per-page `/Contents`, decompressing `/Type /ObjStm` object
  * streams on demand, so pages extract in PAGE-TREE order with
  * `pdf_pages` counting text-bearing PAGES. When the walk fails (no
  * `startxref`, damaged tables — the long tail of real corpora) the
  * lexical scan above is the fallback: streams taken in file order,
  * `pdf_pages` counting text-bearing content streams.
  *
  * Fonts: the structured walk resolves each page's effective
  * /Resources (own or inherited), and any font carrying a /ToUnicode
  * CMap — Type0/CID-keyed or a custom-encoded simple font — has its
  * shown strings decoded code-by-code through the parsed CMap
  * (bfchar + both bfrange forms, codespacerange-derived code width);
  * fonts WITHOUT a /ToUnicode keep the BOM/Latin-1 default, and a
  * CMapped code with no entry emits nothing (glyph indices must not
  * leak as mojibake into dedup keys).
  *
  * Fonts without a /ToUnicode fall back to their
  * `/Encoding /Differences` overlay (glyph names via `uniXXXX`/`uXXXX`
  * + an Adobe-Glyph-List Latin subset; unmapped codes keep their
  * base-encoding meaning). Stream filters: FlateDecode and LZWDecode
  * (early-change variable-width codes), both predictor-aware.
  * Encryption: the RC4 Standard security handler (V1/V2, R2/R3) with
  * an empty user password — the owner-locked shape scanned corpora
  * carry; /U is verified first, so passworded or AES (V≥4) documents
  * read as UNREADABLE (`ok = false`), never as ciphertext lexed into
  * garbage.
  *
  * Documented limits: no AES encryption (V4/V5), no user-passworded
  * documents, and image-only filters (DCT/JBIG2/CCITT) are stepped
  * over — they carry pixels, not text. A
  * malformed file extracts as `ok = false` with empty text — the
  * reference's empty-on-error contract — never an exception (every
  * parser here is index-guarded and depth-capped; fuzz-pinned).
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
      // structured walk first (page-tree order, ObjStm-aware); any
      // failure — or a walk that reaches no text — falls back to the
      // lexical scan, so the envelope is strictly wider than before.
      // EXCEPT for encrypted documents: when a trailer carries
      // /Encrypt (or the walk never loaded a trailer but the raw
      // bytes carry the token), the lexical scan must never run — it
      // would lex ciphertext streams (unfiltered DCT payloads, a
      // damaged page tree behind a verified key) into garbage text.
      // Those read as honest-empty ok=false instead.
      val walk = new XrefWalk(raw, bytes, inflater)
      val structured =
        try walk.extract()
        catch { case scala.util.control.NonFatal(_) => None }
      structured.getOrElse {
        if (walk.sawEncrypt || hasEncryptToken(raw))
          Extracted("", 0, ok = false)
        else extractLexical(raw, bytes, inflater)
      }
    } catch {
      case scala.util.control.NonFatal(_) => Extracted("", 0, ok = false)
    }
  }

  /** Delimited `/Encrypt` token anywhere in the raw bytes — the
    * fail-closed backstop for documents whose xref never loads (so
    * the walk never read a trailer). A false positive (the token
    * inside an unencrypted document's uncompressed string) only
    * suppresses the lexical fallback — the conservative direction;
    * it can never fabricate text. */
  private[graft] def hasEncryptToken(raw: String): Boolean = {
    var i = raw.indexOf("/Encrypt")
    while (i >= 0) {
      val after = i + 8
      if (after >= raw.length || !raw.charAt(after).isLetterOrDigit ||
          raw.startsWith("Metadata", after)) return true
      i = raw.indexOf("/Encrypt", i + 1)
    }
    false
  }

  /** The pre-xref-walk scan (fallback path; also the spec's probe for
    * proving the structured walk is the one producing a result). A
    * parse error in ONE stream (binary data that happens to lex as
    * text operators, a malformed number) skips that stream — never
    * the other 99 pages of the document. */
  private[graft] def extractLexical(raw: String, bytes: Array[Byte],
      inflater: java.util.zip.Inflater): Extracted = {
    val pageTexts = streams(raw, bytes, inflater).flatMap { data =>
      val t =
        try textOps(new String(data, Latin1))
        catch { case scala.util.control.NonFatal(_) => "" }
      if (t.nonEmpty) Some(t) else None
    }
    Extracted(pageTexts.mkString("\n"), pageTexts.length, ok = true)
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
          else if (dict.contains("/LZWDecode")) lzwDecode(data).foreach(out += _)
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

  // ---- LZWDecode (ISO 32000 7.4.4 / TIFF 6.0 LZW) ----
  // Variable-width MSB-first codes 9..12 bits; 256 = ClearTable,
  // 257 = EOD; "early change" (the default) bumps the width one code
  // earlier than strictly needed. The decoder's dictionary runs one
  // entry BEHIND the encoder's at read time, so the width formulas
  // differ by exactly one: decoder f(size + earlyChange), encoder
  // f(size + earlyChange − 1) — the asymmetry the fuzz round-trip
  // (PdfSpec) pins across every width boundary.

  private def lzwWidth(x: Int): Int =
    if (x < 512) 9 else if (x < 1024) 10 else if (x < 2048) 11 else 12

  /** LZW decode; None on a malformed stream (the step-over
    * contract every other filter follows). Tolerates a missing EOD
    * (truncated streams yield what was decoded). */
  private[graft] def lzwDecode(data: Array[Byte],
      earlyChange: Int = 1): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
      val dict = new Array[Array[Byte]](4096)
      var dictSize = 258
      var width = 9
      var prev: Array[Byte] = null
      var bitBuf = 0L
      var bitCnt = 0
      var i = 0
      var done = false
      while (!done) {
        while (bitCnt < width && i < data.length) {
          bitBuf = (bitBuf << 8) | (data(i) & 0xFF); bitCnt += 8; i += 1
        }
        if (bitCnt < width) done = true // ran out of bits: tolerate no-EOD
        else {
          val code = ((bitBuf >>> (bitCnt - width)) & ((1L << width) - 1)).toInt
          bitCnt -= width
          if (code == 256) { dictSize = 258; width = 9; prev = null }
          else if (code == 257) done = true
          else {
            val entry: Array[Byte] =
              if (code < 256) Array(code.toByte)
              else if (code < dictSize && dict(code) != null) dict(code)
              else if (code == dictSize && prev != null) prev :+ prev(0) // KwKwK
              else return None
            out.write(entry)
            if (prev != null && dictSize < 4096) {
              dict(dictSize) = prev :+ entry(0)
              dictSize += 1
            }
            width = lzwWidth(dictSize + earlyChange)
            prev = entry
          }
        }
      }
      Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** LZW encode — the fixture-writer half ([[synthesize]]'s `lzw`
    * mode); emits ClearTable first and EOD last, resets at a full
    * table, width-synchronized with [[lzwDecode]]. */
  private[graft] def lzwEncode(data: Array[Byte],
      earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length))
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code.toLong
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xFF).toInt); bitCnt -= 8
      }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var dictSize = 258
    def key(p: Int, b: Int): Integer = Integer.valueOf((p << 8) | b)
    put(256)
    var prev = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xFF
      if (prev == -1) prev = b
      else {
        val c = dict.get(key(prev, b))
        if (c != null) prev = c.intValue()
        else {
          put(prev)
          if (dictSize < 4096) {
            dict.put(key(prev, b), Integer.valueOf(dictSize))
            dictSize += 1
            width = lzwWidth(dictSize + earlyChange - 1)
          } else {
            put(256) // table full: clear and start over
            dict.clear(); dictSize = 258; width = 9
          }
          prev = b
        }
      }
      i += 1
    }
    if (prev != -1) put(prev)
    put(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    out.toByteArray
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

  /** The predefined registry CMaps whose CODE SPACE is Unicode
    * itself: `Uni<collection>-UCS2[-HW]-H/V` and
    * `Uni<collection>-UTF16[-HW]-H/V` (Adobe-GB1, -CNS1, -Japan1/
    * JIS2004, -Korea1/-KR, -HKSCS collections). In these encodings
    * the 2-byte character codes in content-stream strings ARE UCS-2 /
    * UTF-16BE code units — the CMap's CID mapping exists only to pick
    * glyphs, so TEXT extraction is an exact UTF-16BE passthrough with
    * no bundled table (surrogate pairs in the UTF16 forms compose
    * across adjacent 2-byte codes). The UTF32/UTF8 forms are
    * deliberately NOT matched: their code width is not 2, and
    * misreading them as UCS-2 would fabricate text. */
  private[graft] val UnicodeCodespaceCmap =
    "^Uni(GB|CNS|JIS(2004)?|KS|AKR|HKS?)-(UCS2|UTF16)(-HW)?-[HV]$".r
      .pattern

  /** Parsed /ToUnicode CMap: fixed code byte-width + code → text.
    * The decode contract is pdfplumber's: string bytes step by
    * `codeLen`, each code maps through the CMap; a code with NO entry
    * has no text meaning and emits nothing (raw CID codes are glyph
    * indices — leaking them as mojibake would poison dedup keys and
    * token stats downstream). */
  private[graft] final case class ToUnicode(codeLen: Int, map: Map[Int, String],
      fallbackLatin1: Boolean = false, identityUtf16: Boolean = false) {
    def decode(b: Array[Byte]): String = {
      val sb = new StringBuilder
      var i = 0
      while (i + codeLen <= b.length) {
        var code = 0
        var j = 0
        while (j < codeLen) { code = (code << 8) | (b(i + j) & 0xFF); j += 1 }
        map.get(code) match {
          case Some(s) => sb.append(s)
          // the /Differences overlay semantics: codes the difference
          // array does NOT remap keep their base-encoding meaning
          // (≈Latin-1 here, the same default as unmapped strings)
          case None if fallbackLatin1 && code <= 0xFF =>
            sb.append(code.toChar)
          // /Identity-H Type0 fonts without /ToUnicode: 2-byte codes
          // pass through as UTF-16BE units (CID ≡ Unicode — the shape
          // subset writers that key glyphs by code point emit;
          // surrogate pairs compose naturally across adjacent codes)
          case None if identityUtf16 => sb.append(code.toChar)
          case None => ()
        }
        i += codeLen
      }
      sb.toString
    }
  }

  /** Glyph name → text, for /Encoding /Differences fonts without a
    * /ToUnicode: the `uniXXXX`/`uXXXX[XX]` forms decode numerically;
    * a compact Adobe-Glyph-List subset covers the Latin names a real
    * Spanish/Latin corpus meets; single-letter names map to
    * themselves. Unknown names yield None (the code keeps its
    * base-encoding meaning — never mojibake). */
  private[graft] def glyphToUnicode(name: String): Option[String] = {
    if (name.length == 1 && name.charAt(0).isLetter) return Some(name)
    if (name.startsWith("uni") && name.length >= 7 &&
        (name.length - 3) % 4 == 0 &&
        name.drop(3).forall(c => Character.digit(c, 16) >= 0)) {
      val sb = new StringBuilder
      name.drop(3).grouped(4).foreach(g =>
        sb.append(Integer.parseInt(g, 16).toChar))
      return Some(sb.toString)
    }
    if (name.startsWith("u") && name.length >= 5 && name.length <= 7 &&
        name.drop(1).forall(c => Character.digit(c, 16) >= 0))
      return Some(new String(Character.toChars(Integer.parseInt(name.drop(1), 16))))
    AglSubset.get(name)
  }

  private val AglSubset: Map[String, String] = Map(
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
    "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
    "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
    "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
    "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
    "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
    "eight" -> "8", "nine" -> "9", "colon" -> ":", "semicolon" -> ";",
    "less" -> "<", "equal" -> "=", "greater" -> ">", "question" -> "?",
    "at" -> "@", "bracketleft" -> "[", "backslash" -> "\\",
    "bracketright" -> "]", "asciicircum" -> "^", "underscore" -> "_",
    "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
    "braceright" -> "}", "asciitilde" -> "~",
    "exclamdown" -> "¡", "questiondown" -> "¿",
    "ntilde" -> "ñ", "Ntilde" -> "Ñ",
    "aacute" -> "á", "eacute" -> "é", "iacute" -> "í",
    "oacute" -> "ó", "uacute" -> "ú",
    "Aacute" -> "Á", "Eacute" -> "É", "Iacute" -> "Í",
    "Oacute" -> "Ó", "Uacute" -> "Ú",
    "udieresis" -> "ü", "Udieresis" -> "Ü",
    "adieresis" -> "ä", "odieresis" -> "ö",
    "edieresis" -> "ë", "idieresis" -> "ï",
    "ccedilla" -> "ç", "Ccedilla" -> "Ç",
    "agrave" -> "à", "egrave" -> "è", "igrave" -> "ì",
    "ograve" -> "ò", "ugrave" -> "ù",
    "quoteleft" -> "‘", "quoteright" -> "’",
    "quotedblleft" -> "“", "quotedblright" -> "”",
    "endash" -> "–", "emdash" -> "—",
    "guillemotleft" -> "«", "guillemotright" -> "»",
    "bullet" -> "•", "ellipsis" -> "…", "degree" -> "°",
    "ordfeminine" -> "ª", "ordmasculine" -> "º",
    "amacron" -> "ā", "emacron" -> "ē", "imacron" -> "ī",
    "omacron" -> "ō", "umacron" -> "ū",
    // Latin extended + typographic punctuation (AGL rows)
    "AE" -> "Æ", "ae" -> "æ", "OE" -> "Œ", "oe" -> "œ",
    "Oslash" -> "Ø", "oslash" -> "ø", "Aring" -> "Å", "aring" -> "å",
    "germandbls" -> "ß", "Thorn" -> "Þ", "thorn" -> "þ",
    "Eth" -> "Ð", "eth" -> "ð", "Atilde" -> "Ã", "atilde" -> "ã",
    "Otilde" -> "Õ", "otilde" -> "õ", "Yacute" -> "Ý", "yacute" -> "ý",
    "ydieresis" -> "ÿ", "Ydieresis" -> "Ÿ",
    "Scaron" -> "Š", "scaron" -> "š", "Zcaron" -> "Ž", "zcaron" -> "ž",
    "Lslash" -> "Ł", "lslash" -> "ł",
    "dagger" -> "†", "daggerdbl" -> "‡", "perthousand" -> "‰",
    "trademark" -> "™", "copyright" -> "©", "registered" -> "®",
    "section" -> "§", "paragraph" -> "¶", "plusminus" -> "±",
    "multiply" -> "×", "divide" -> "÷", "logicalnot" -> "¬",
    "florin" -> "ƒ", "fraction" -> "⁄", "minus" -> "−",
    "quotesinglbase" -> "‚", "quotedblbase" -> "„",
    "guilsinglleft" -> "‹", "guilsinglright" -> "›",
    "Euro" -> "€", "sterling" -> "£", "yen" -> "¥", "cent" -> "¢",
    "currency" -> "¤", "micro" -> "µ", "periodcentered" -> "·",
    "brokenbar" -> "¦", "onequarter" -> "¼", "onehalf" -> "½",
    "threequarters" -> "¾", "onesuperior" -> "¹",
    "twosuperior" -> "²", "threesuperior" -> "³",
    "macron" -> "¯", "acute" -> "´", "cedilla" -> "¸",
    "dieresis" -> "¨", "tilde" -> "˜", "circumflex" -> "ˆ",
    "caron" -> "ˇ", "breve" -> "˘", "dotaccent" -> "˙",
    "ring" -> "˚", "ogonek" -> "˛", "hungarumlaut" -> "˝") ++
    AglGreek ++ AglCyrillic

  /** AGL Greek block: letter names map 1:1 to the Greek and Coptic
    * range, plus the variant/tonos rows real Type1 Greek fonts use. */
  private def AglGreek: Map[String, String] = {
    val caps = Seq("Alpha", "Beta", "Gamma", "Delta", "Epsilon", "Zeta",
      "Eta", "Theta", "Iota", "Kappa", "Lambda", "Mu", "Nu", "Xi",
      "Omicron", "Pi", "Rho", "Sigma", "Tau", "Upsilon", "Phi", "Chi",
      "Psi", "Omega")
    // uppercase Α=0391.., skipping 03A2 (unassigned) after Rho
    val capCps = (0x0391 to 0x03A1) ++ (0x03A3 to 0x03A9)
    // lowercase α=03B1..03C9 including final sigma 03C2 (named sigma1)
    val lows = caps.map(_.toLowerCase)
    val lowCps = (0x03B1 to 0x03C1) ++ (0x03C3 to 0x03C9)
    (caps.zip(capCps) ++ lows.zip(lowCps)).map { case (n, cp) =>
      n -> cp.toChar.toString
    }.toMap ++ Map(
      "sigma1" -> "ς", "theta1" -> "ϑ", "phi1" -> "ϕ", "omega1" -> "ϖ",
      "alphatonos" -> "ά", "epsilontonos" -> "έ", "etatonos" -> "ή",
      "iotatonos" -> "ί", "omicrontonos" -> "ό", "upsilontonos" -> "ύ",
      "omegatonos" -> "ώ", "iotadieresis" -> "ϊ",
      "upsilondieresis" -> "ϋ")
  }

  /** Single-character AGL rows reversed (char → canonical glyph
    * name) — the fixture writer's half: [[synthesizeDifferences]]
    * names glyphs the way real AGL-conformant fonts do. Built lazily
    * AFTER AglSubset initializes. */
  private lazy val AglReverse: Map[Char, String] =
    AglSubset.collect {
      case (n, v) if v.length == 1 && !(n.length == 1) => v.charAt(0) -> n
    }

  /** AGL Cyrillic block: the `afiiNNNNN` rows — uppercase А..Я at
    * afii10017..10049 (Ё inline after Е) and lowercase а..я at
    * afii10065..10097 (ё after е), the layout every AGL-conformant
    * Cyrillic Type1 font names its glyphs with. */
  private def AglCyrillic: Map[String, String] = {
    val caps = "АБВГДЕЁЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ"
    val lows = "абвгдеёжзийклмнопрстуфхцчшщъыьэюя"
    (caps.zipWithIndex.map { case (c, i) =>
      s"afii${10017 + i}" -> c.toString
    } ++ lows.zipWithIndex.map { case (c, i) =>
      s"afii${10065 + i}" -> c.toString
    }).toMap
  }

  /** `/Differences [ n /name /name m /name … ]` → code → text.
    * Integers set the next code; each name consumes one code. Names
    * with no known mapping keep their base-encoding meaning (the
    * code is simply absent from the overlay). */
  private def parseDifferences(arr: Vector[PVal]): Map[Int, String] = {
    val m = Map.newBuilder[Int, String]
    var code = 0
    arr.foreach {
      case PNum(v) => code = v.toInt
      case PName(n) =>
        glyphToUnicode(n).foreach(s => m += code -> s)
        code += 1
      case _ => ()
    }
    m.result()
  }

  /** Parse a decoded /ToUnicode CMap stream: `begincodespacerange`
    * fixes the code byte-width (first range's low bound; bfchar source
    * width is the fallback), `beginbfchar` pairs and `beginbfrange`
    * triples (both the `<lo> <hi> <dstStart>` increment form and the
    * `<lo> <hi> [<d0> <d1> …]` array form) fill the map. Destination
    * hex is UTF-16BE (the CMap spec's convention — multi-char
    * ligature targets come through intact). Range sizes and the total
    * entry count are capped so a fuzzer's `<0000> <FFFF>` range can't
    * balloon memory; a cap hit keeps what was parsed (partial map,
    * never a throw). */
  private[graft] def parseToUnicode(text: String): Option[ToUnicode] = {
    val MaxEntries = 1 << 17
    def hexTokenAt(p0: Int): Option[(Array[Byte], Int)] = {
      val p = skipWs(text, p0)
      if (p >= text.length || text.charAt(p) != '<') return None
      var i = p + 1
      val hex = new StringBuilder
      while (i < text.length && text.charAt(i) != '>') {
        val c = text.charAt(i)
        if (!c.isWhitespace) hex.append(c)
        i += 1
      }
      if (i >= text.length || hex.isEmpty || hex.length % 2 == 1 ||
        !hex.forall(c => Character.digit(c, 16) >= 0)) return None
      val out = new Array[Byte](hex.length / 2)
      var j = 0
      while (j < out.length) {
        out(j) = Integer.parseInt(hex.substring(2 * j, 2 * j + 2), 16).toByte
        j += 1
      }
      Some((out, i + 1))
    }
    def codeOf(b: Array[Byte]): Int = {
      var v = 0; var i = 0
      while (i < b.length && i < 4) { v = (v << 8) | (b(i) & 0xFF); i += 1 }
      v
    }
    def utf16(b: Array[Byte]): String =
      new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
    val m = scala.collection.mutable.HashMap.empty[Int, String]
    var codeLen = 0
    // code width from the first codespacerange bound
    val csr = text.indexOf("begincodespacerange")
    if (csr >= 0) hexTokenAt(csr + "begincodespacerange".length)
      .foreach { case (b, _) => if (b.length >= 1 && b.length <= 4) codeLen = b.length }
    // bfchar blocks
    var p = text.indexOf("beginbfchar")
    while (p >= 0 && m.size < MaxEntries) {
      var q = p + "beginbfchar".length
      var go = true
      while (go && m.size < MaxEntries) {
        (for { (src, q1) <- hexTokenAt(q); (dst, q2) <- hexTokenAt(q1) }
          yield (src, dst, q2)) match {
          case Some((src, dst, q2)) =>
            if (codeLen == 0) codeLen = src.length
            m.update(codeOf(src), utf16(dst)); q = q2
          case None => go = false
        }
      }
      p = text.indexOf("beginbfchar", q)
    }
    // bfrange blocks
    p = text.indexOf("beginbfrange")
    while (p >= 0 && m.size < MaxEntries) {
      var q = p + "beginbfrange".length
      var go = true
      while (go && m.size < MaxEntries) {
        (for { (lo, q1) <- hexTokenAt(q); (hi, q2) <- hexTokenAt(q1) }
          yield (lo, hi, q2)) match {
          case None => go = false
          case Some((lo, hi, q2)) =>
            if (codeLen == 0) codeLen = lo.length
            val loC = codeOf(lo); val hiC = codeOf(hi)
            val r = skipWs(text, q2)
            if (r < text.length && text.charAt(r) == '[') {
              // array form: one destination per code
              var k = loC
              var rp = r + 1
              var inner = true
              while (inner && k <= hiC && m.size < MaxEntries) {
                hexTokenAt(rp) match {
                  case Some((dst, rn)) =>
                    m.update(k, utf16(dst)); k += 1; rp = rn
                  case None => inner = false
                }
              }
              val close = text.indexOf(']', rp)
              q = if (close >= 0) close + 1 else rp
            } else hexTokenAt(r) match {
              case Some((dst0, rn)) =>
                // increment form: the LAST 16-bit unit of the UTF-16BE
                // destination steps with the code (the CMap convention)
                val base = utf16(dst0)
                val span = math.min(hiC - loC, 0xFFFF)
                var k = 0
                while (k <= span && m.size < MaxEntries) {
                  val stepped =
                    if (base.isEmpty) base
                    else base.dropRight(1) + (base.last + k).toChar
                  m.update(loC + k, stepped)
                  k += 1
                }
                q = rn
              case None => go = false
            }
        }
      }
      p = text.indexOf("beginbfrange", q)
    }
    if (m.isEmpty || codeLen < 1 || codeLen > 4) None
    else Some(ToUnicode(codeLen, m.toMap))
  }

  /** `/Name <numeric operands> Tf` starting at `start` (the `/`) →
    * (font resource name, index after Tf); None when the sequence at
    * `start` is not a font-select. */
  private def tryFontSelect(s: String, start: Int): Option[(String, Int)] = {
    var i = start + 1
    while (i < s.length && !isPdfDelim(s.charAt(i))) i += 1
    if (i == start + 1) return None
    val name = s.substring(start + 1, i)
    // operands between the name and Tf are numeric (the size)
    var p = skipWs(s, i)
    var guard = 0
    while (p < s.length && guard < 4 &&
        (s.charAt(p).isDigit || s.charAt(p) == '-' ||
          s.charAt(p) == '+' || s.charAt(p) == '.')) {
      p += 1
      while (p < s.length && (s.charAt(p).isDigit || s.charAt(p) == '.')) p += 1
      p = skipWs(s, p)
      guard += 1
    }
    if (s.regionMatches(p, "Tf", 0, 2) && delimited(s, p, 2))
      Some((name, p + 2))
    else None
  }

  /** Text operators of one decoded content stream → extracted text.
    * Empty when the stream carries no BT/ET text (image data, fonts).
    * `fonts` maps font RESOURCE names (the `/F1` of `/F1 12 Tf`) to
    * their parsed /ToUnicode CMaps: while a mapped font is selected,
    * shown strings decode code-by-code through the CMap (Type0/CID
    * and custom-encoded simple fonts); fonts without a CMap — and the
    * lexical fallback, which has no resource tree to look fonts up
    * in — keep the BOM/Latin-1 default. */
  private[graft] def textOps(s: String,
      fonts: Map[String, ToUnicode] = Map.empty): String = {
    val sb = new StringBuilder
    var i = 0
    var inText = false
    var needNewline = false
    var cur: Option[ToUnicode] = None
    def dec(b: Array[Byte]): String =
      cur.map(_.decode(b)).getOrElse(decodeString(b))
    def emit(str: String): Unit = {
      if (needNewline && sb.nonEmpty) sb.append('\n')
      needNewline = false
      sb.append(str)
    }
    def fontSelect(at: Int): Option[Int] =
      if (fonts.isEmpty) None
      else tryFontSelect(s, at).map { case (name, after) =>
        cur = fonts.get(name); after
      }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') { // comment to end of line
        while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (!inText) {
        if (c == 'B' && s.regionMatches(i, "BT", 0, 2) && delimited(s, i, 2)) {
          inText = true; i += 2
        } else if (c == '/') {
          // Tf is a text-STATE operator — legal outside BT/ET too
          i = fontSelect(i).getOrElse(i + 1)
        } else i += 1
      } else if (c == '(') {
        val (strB, next) = literalStringBytes(s, i)
        i = next
        val op = nextToken(s, i)
        op._1 match {
          case "Tj" => emit(dec(strB)); i = op._2
          case "'"  => needNewline = true; emit(dec(strB)); i = op._2
          case "\"" => needNewline = true; emit(dec(strB)); i = op._2
          case _    => // positioned string with no show op — ignore
        }
      } else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') {
        // inline dictionary (marked-content properties: `/P << /MCID 0 >> BDC`)
        // — skip it whole, or its body would lex as a hex string
        i = skipInlineDict(s, i)
      } else if (c == '<') {
        val (strB, next) = hexStringBytes(s, i)
        i = next
        val op = nextToken(s, i)
        op._1 match {
          case "Tj" => emit(dec(strB)); i = op._2
          case "'"  => needNewline = true; emit(dec(strB)); i = op._2
          case "\"" => needNewline = true; emit(dec(strB)); i = op._2
          case _    =>
        }
      } else if (c == '[') {
        val (str, next) = tjArray(s, i, dec)
        i = next
        val op = nextToken(s, i)
        if (op._1 == "TJ") { emit(str); i = op._2 }
      } else if (c == 'E' && s.regionMatches(i, "ET", 0, 2) && delimited(s, i, 2)) {
        inText = false; needNewline = true; i += 2
      } else if ((c == 'T' && i + 1 < s.length &&
          (s.charAt(i + 1) == 'd' || s.charAt(i + 1) == 'D' || s.charAt(i + 1) == '*')
          && delimited(s, i, 2))) {
        needNewline = true; i += 2
      } else if (c == '/') {
        i = fontSelect(i).getOrElse(i + 1)
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
    val (b, next) = literalStringBytes(s, start)
    (decodeString(b), next)
  }

  /** [[literalString]]'s RAW-BYTES form — the string's code bytes
    * before any charset/CMap interpretation (a CID font's codes must
    * reach the ToUnicode map undecoded). */
  private[sources] def literalStringBytes(s: String, start: Int): (Array[Byte], Int) = {
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
    (bytes.toByteArray, i)
  }

  /** PDF hex string starting at `<`: returns (decoded, index after `>`). */
  private[sources] def hexString(s: String, start: Int): (String, Int) = {
    val (b, next) = hexStringBytes(s, start)
    (decodeString(b), next)
  }

  /** [[hexString]]'s RAW-BYTES form (see [[literalStringBytes]]). */
  private[sources] def hexStringBytes(s: String, start: Int): (Array[Byte], Int) = {
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
    (out, i + 1)
  }

  /** UTF-16BE when BOM'd, Latin-1 (≈PDFDocEncoding) otherwise. */
  private def decodeString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
      new String(b, 2, b.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
    else new String(b, Latin1)

  /** `[(a) -250 (b)] TJ` array: strings concatenated; a kerning value
    * below −180 (thousandths of an em) renders as a word gap. */
  private[sources] def tjArray(s: String, start: Int): (String, Int) =
    tjArray(s, start, decodeString)

  /** [[tjArray]] with the CALLER's string decoder — the font-aware
    * text pass routes array elements through the current CMap. */
  private[sources] def tjArray(s: String, start: Int,
      dec: Array[Byte] => String): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    while (i < s.length && s.charAt(i) != ']') {
      val c = s.charAt(i)
      if (c == '(') {
        val (b, next) = literalStringBytes(s, i); sb.append(dec(b)); i = next
      } else if (c == '<') {
        val (b, next) = hexStringBytes(s, i); sb.append(dec(b)); i = next
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

  // ======== structured cross-reference walk (the PDF 1.5 envelope:
  // xref streams, object streams, /Prev chains, hybrid /XRefStm —
  // the layouts the reference's pdfplumber opens,
  // /root/reference/pipeline/ingestion/drivers.py:33-50) ========

  /** Minimal PDF object model — just the shapes the walk needs. */
  private sealed trait PVal
  private final case class PNum(v: Double) extends PVal
  private final case class PRef(num: Int) extends PVal
  private final case class PName(v: String) extends PVal
  private final case class PArr(v: Vector[PVal]) extends PVal
  private final case class PDict(m: Map[String, PVal]) extends PVal
  private final case class PStr(b: Array[Byte]) extends PVal
  private case object POther extends PVal

  // ---- Standard security handler (ISO 32000 7.6.2-7.6.4) — the
  // "owner-locked, empty user password" shape most encrypted scanned
  // corpora ship with. Three cipher generations are in envelope:
  // RC4 (V1/V2, R2/R3), AES-128-CBC behind V4 /CF crypt filters
  // (CFM /AESV2, R4 — plus /V2 = RC4 in the V4 envelope), and
  // AES-256-CBC (V5, R5/R6, CFM /AESV3). Every path verifies /U
  // BEFORE decrypting, so a passworded, tampered, or
  // unknown-crypt-filter document reads as UNREADABLE, never as
  // garbage. ----

  private val PdfPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xFF
      y = (y + s(x)) & 0xFF
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  private def padPw(pw: Array[Byte]): Array[Byte] =
    (pw.take(32) ++ PdfPad).take(32)

  private def pLe(p: Int): Array[Byte] = Array(
    (p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
    ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte)

  /** Algorithm 2: the file encryption key (empty-user-password use).
    * For R4+, `/EncryptMetadata false` appends 0xFFFFFFFF to the
    * digest input — callers try both shapes since the boolean lives
    * outside the parsed value model. */
  private[graft] def pdfFileKey(userPw: Array[Byte], o: Array[Byte],
      p: Int, id0: Array[Byte], r: Int, lenBytes: Int,
      encryptMeta: Boolean = true): Array[Byte] = {
    val n = if (r == 2) 5 else lenBytes
    val extra =
      if (r >= 4 && !encryptMeta) Array.fill[Byte](4)(0xFF.toByte)
      else Array.empty[Byte]
    var key = md5(padPw(userPw), o.take(32), pLe(p), id0, extra).take(n)
    if (r >= 3) (0 until 50).foreach(_ => key = md5(key).take(n))
    key
  }

  /** Algorithm 3: the /O entry (fixture writer's half). */
  private[graft] def pdfOwnerO(ownerPw: Array[Byte], userPw: Array[Byte],
      r: Int, lenBytes: Int): Array[Byte] = {
    val n = if (r == 2) 5 else lenBytes
    var h = md5(padPw(ownerPw))
    if (r >= 3) (0 until 50).foreach(_ => h = md5(h))
    val key = h.take(n)
    var o = rc4(key, padPw(userPw))
    if (r >= 3) (1 to 19).foreach(i =>
      o = rc4(key.map(b => (b ^ i).toByte), o))
    o
  }

  /** Algorithms 4 (R2) / 5 (R3): the /U entry. */
  private[graft] def pdfUserU(encKey: Array[Byte], id0: Array[Byte],
      r: Int): Array[Byte] =
    if (r == 2) rc4(encKey, PdfPad)
    else {
      var u = rc4(encKey, md5(PdfPad, id0))
      (1 to 19).foreach(i => u = rc4(encKey.map(b => (b ^ i).toByte), u))
      u ++ new Array[Byte](16)
    }

  /** Algorithm 1's per-object RC4 key. */
  private[graft] def pdfObjKey(fileKey: Array[Byte], num: Int,
      gen: Int): Array[Byte] =
    md5(fileKey ++ Array(
      (num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
      ((num >> 16) & 0xFF).toByte,
      (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte))
      .take(math.min(fileKey.length + 5, 16))

  /** Algorithm 1's per-object AES-128 key (CFM /AESV2): the RC4
    * derivation plus the constant `sAlT` suffix ISO 32000 7.6.2
    * mandates for AES filters. AESV3 skips this — the file key is
    * used directly. */
  private[graft] def pdfObjKeyAes(fileKey: Array[Byte], num: Int,
      gen: Int): Array[Byte] =
    md5(fileKey ++ Array(
      (num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
      ((num >> 16) & 0xFF).toByte,
      (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte,
      0x73.toByte, 0x41.toByte, 0x6C.toByte, 0x54.toByte))
      .take(math.min(fileKey.length + 5, 16))

  /** AES-CBC through the JDK provider. `pad=true` uses PKCS#5 (the
    * stream/string payload shape); `pad=false` is the raw-key shape
    * (/UE, /OE — exactly two blocks, no padding). Throws on malformed
    * padding — callers convert that to a skipped stream, never to
    * garbage text. */
  private[graft] def aesCbc(encrypt: Boolean, key: Array[Byte],
      iv: Array[Byte], data: Array[Byte], pad: Boolean): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance(
      if (pad) "AES/CBC/PKCS5Padding" else "AES/CBC/NoPadding")
    c.init(
      if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** AES-ECB, no padding — only the 16-byte /Perms block uses it. */
  private[graft] def aesEcb(encrypt: Boolean, key: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    c.init(
      if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"))
    c.doFinal(data)
  }

  private def sha2(bits: Int, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(s"SHA-$bits")
    parts.foreach(d.update)
    d.digest()
  }

  /** ISO 32000-2 Algorithm 2.B (R6) / plain SHA-256 (the deprecated
    * R5): the password hash AES-256 documents verify /U and derive
    * the intermediate key with. R6 iterates: K1 = 64×(pw∥K∥udata),
    * E = AES-128-CBC(K[0..16], iv=K[16..32], K1), then K re-hashes E
    * through SHA-{256,384,512} picked by (ΣE[0..16]) mod 3 — 256 ≡ 1
    * (mod 3), so the byte sum equals the spec's big-endian-integer
    * residue — until ≥64 rounds AND E's last byte ≤ round−32. The
    * fixture writer and the reader share this one implementation, and
    * the formulation matches the published qpdf/pdfminer loop, so
    * real AES-256 documents verify identically. */
  private[graft] def pdfHash2B(pw: Array[Byte], salt: Array[Byte],
      udata: Array[Byte], r: Int): Array[Byte] = {
    if (r == 5) return sha2(256, pw, salt, udata)
    var k = sha2(256, pw, salt, udata)
    var i = 0
    var done = false
    while (!done) {
      val block = pw ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var j = 0
      while (j < 64) {
        System.arraycopy(block, 0, k1, j * block.length, block.length)
        j += 1
      }
      val e = aesCbc(encrypt = true, k.take(16), k.slice(16, 32), k1,
        pad = false)
      var sum = 0
      var b = 0
      while (b < 16) { sum += e(b) & 0xFF; b += 1 }
      k = sha2(sum % 3 match {
        case 0 => 256
        case 1 => 384
        case _ => 512
      }, e)
      // Termination (ISO 32000-2 7.6.4.3.4, qpdf/pdfminer agree):
      // after round `i+1` (1-based), stop iff rounds >= 64 and E's
      // last byte <= rounds - 32. With 0-based `i` checked before the
      // increment that is `i >= 63 && last <= (i+1) - 32 = i - 31`.
      // (`i - 32` here was an off-by-one that added a spurious extra
      // round whenever the canonical loop ends exactly on the
      // boundary — caught by the external known-answer vectors in
      // PdfSpec.)
      if (i >= 63 && (e(e.length - 1) & 0xFF) <= i - 31) done = true
      i += 1
    }
    k.take(32)
  }

  private def isPdfDelim(c: Char): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%' || c.isWhitespace

  /** Skip PDF whitespace and `%` comments. */
  private def skipWs(s: String, p0: Int): Int = {
    var p = p0
    var go = true
    while (go && p < s.length) {
      val c = s.charAt(p)
      if (c == '%') {
        while (p < s.length && s.charAt(p) != '\n' && s.charAt(p) != '\r') p += 1
      } else if (c.isWhitespace) p += 1
      else go = false
    }
    p
  }

  /** Unsigned decimal at `p`; (value, after) or None. Int-guarded. */
  private def parseUInt(s: String, p0: Int): Option[(Int, Int)] = {
    var p = p0
    var v = 0L
    while (p < s.length && s.charAt(p).isDigit && v < Int.MaxValue) {
      v = v * 10 + (s.charAt(p) - '0'); p += 1
    }
    if (p == p0 || v > Int.MaxValue) None else Some((v.toInt, p))
  }

  /** One PDF value at `pos` → (value, index after). Total: malformed
    * input yields POther and always advances; recursion depth-capped
    * (a fuzzer's `[[[[...` must not overflow the stack — the fallback
    * contract is NonFatal-only). */
  private def parseVal(s: String, pos0: Int, depth: Int = 0): (PVal, Int) = {
    val pos = skipWs(s, pos0)
    if (pos >= s.length || depth > 48) return (POther, math.min(pos + 1, s.length))
    val c = s.charAt(pos)
    if (c == '<' && pos + 1 < s.length && s.charAt(pos + 1) == '<') {
      parseDict(s, pos, depth)
    } else if (c == '<') {
      val (b, n) = hexStringBytes(s, pos); (PStr(b), n)
    } else if (c == '(') {
      val (b, n) = literalStringBytes(s, pos); (PStr(b), n)
    }
    else if (c == '/') {
      var i = pos + 1
      while (i < s.length && !isPdfDelim(s.charAt(i))) i += 1
      (PName(s.substring(pos + 1, i)), i)
    } else if (c == '[') {
      var i = pos + 1
      val b = Vector.newBuilder[PVal]
      var go = true
      while (go) {
        val j = skipWs(s, i)
        if (j >= s.length) { go = false; i = j }
        else if (s.charAt(j) == ']') { go = false; i = j + 1 }
        else {
          val (v, n) = parseVal(s, j, depth + 1)
          if (n <= j) { go = false; i = j + 1 } else { b += v; i = n }
        }
      }
      (PArr(b.result()), i)
    } else if (c == '-' || c == '+' || c == '.' || c.isDigit) {
      var i = pos + 1
      while (i < s.length &&
          (s.charAt(i).isDigit || s.charAt(i) == '.' ||
            s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      val num = s.substring(pos, i).toDoubleOption
      // `N G R` lookahead: two non-negative ints then a delimited R
      if (num.exists(v => v >= 0 && v <= Int.MaxValue && v == v.floor)) {
        parseUInt(s, skipWs(s, i)).foreach { case (_, afterGen) =>
          val l = skipWs(s, afterGen)
          if (l < s.length && s.charAt(l) == 'R' &&
              (l + 1 >= s.length || isPdfDelim(s.charAt(l + 1))))
            return (PRef(num.get.toInt), l + 1)
        }
      }
      (num.map(PNum).getOrElse(POther), i)
    } else {
      var i = pos
      while (i < s.length && s.charAt(i).isLetter) i += 1
      (POther, if (i == pos) pos + 1 else i) // true/false/null/junk
    }
  }

  private def parseDict(s: String, pos: Int, depth: Int): (PVal, Int) = {
    var i = pos + 2
    val m = Map.newBuilder[String, PVal]
    var go = true
    while (go) {
      val j = skipWs(s, i)
      if (j >= s.length) { go = false; i = j }
      else if (j + 1 < s.length && s.charAt(j) == '>' && s.charAt(j + 1) == '>') {
        go = false; i = j + 2
      } else {
        parseVal(s, j, depth + 1) match {
          case (PName(key), n) =>
            val (v, n2) = parseVal(s, n, depth + 1)
            m += key -> v
            i = math.max(n2, j + 1)
          case (_, n) => i = math.max(n, j + 1) // junk key — skip it
        }
      }
    }
    (PDict(m.result()), i)
  }

  /** Big-endian unsigned int of `w` bytes (w=0 → 0). */
  private def readBE(d: Array[Byte], pos: Int, w: Int): Long = {
    var v = 0L
    var i = 0
    while (i < w) { v = (v << 8) | (d(pos + i) & 0xFFL); i += 1 }
    v
  }

  /** Undo a /DecodeParms predictor: 1 = none, 2 = TIFF horizontal,
    * 10–15 = PNG (per-row filter byte: None/Sub/Up/Average/Paeth) —
    * predictor 12 (PNG Up) is what real xref-stream writers emit.
    * Malformed rows truncate the output rather than throw. */
  private[graft] def unpredict(data: Array[Byte], predictor: Int,
      columns: Int, colors: Int = 1, bpc: Int = 8): Array[Byte] = {
    if (predictor < 2) return data
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = math.max(1, (columns * colors * bpc + 7) / 8)
    if (predictor == 2) { // TIFF: left-add per sample byte
      val out = data.clone()
      var r = 0
      while (r + rowLen <= out.length) {
        var i = bpp
        while (i < rowLen) {
          out(r + i) = (out(r + i) + out(r + i - bpp)).toByte; i += 1
        }
        r += rowLen
      }
      return out
    }
    // PNG predictors: rows of (1 filter byte + rowLen data bytes)
    val nRows = data.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    val prev = new Array[Byte](rowLen)
    var r = 0
    while (r < nRows) {
      val base = r * (rowLen + 1)
      val filter = data(base) & 0xFF
      var i = 0
      while (i < rowLen) {
        val x = data(base + 1 + i) & 0xFF
        val left = if (i >= bpp) out(r * rowLen + i - bpp) & 0xFF else 0
        val up = prev(i) & 0xFF
        val upLeft = if (i >= bpp) prev(i - bpp) & 0xFF else 0
        val v = filter match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + ((left + up) / 2)
          case 4 => // Paeth
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => x
        }
        out(r * rowLen + i) = (v & 0xFF).toByte
        i += 1
      }
      System.arraycopy(out, r * rowLen, prev, 0, rowLen)
      r += 1
    }
    out
  }

  private final case class XInFile(off: Int)
  private final case class XInStm(stm: Int, idx: Int)

  /** One document's cross-reference walk. Entries resolve newest-wins
    * across /Prev chains; object streams decompress once per document
    * (cache), which at corpus scale is once per ROW inside the
    * `mapPartitions` decode pass — the walk allocates nothing global
    * and shares the per-partition Inflater. */
  private final class XrefWalk(raw: String, bytes: Array[Byte],
      inflater: java.util.zip.Inflater) {
    import scala.collection.mutable

    private val entries = mutable.HashMap.empty[Int, Any] // XInFile | XInStm
    private var rootRef: Option[Int] = None
    private val objStmCache =
      mutable.HashMap.empty[Int, Option[(String, Vector[(Int, Int)])]]
    // encryption state (newest trailer wins, like /Root)
    private var encryptVal: Option[PVal] = None
    private var fileId0: Array[Byte] = Array.empty
    private var encKey: Option[Array[Byte]] = None
    private var encCfm: String = "RC4" // "RC4" | "AESV2" | "AESV3"
    private var encUnreadable = false

    /** Whether any loaded trailer carried /Encrypt — the caller's
      * never-lex-ciphertext guard (an encrypted document that the
      * walk cannot extract must NOT fall through to the lexical
      * scan over raw ciphertext). */
    def sawEncrypt: Boolean = encryptVal.isDefined

    private def record(num: Int, e: Any): Unit =
      if (!entries.contains(num)) entries.update(num, e) // newest wins

    // ---- section loading ----

    private def load(): Boolean = {
      val sx = raw.lastIndexOf("startxref")
      if (sx < 0) return false
      val first = parseUInt(raw, skipWs(raw, sx + 9)).map(_._1)
      if (first.isEmpty) return false
      val queue = mutable.Queue(first.get)
      val seen = mutable.Set.empty[Int]
      var any = false
      var guard = 0
      while (queue.nonEmpty && guard < 64) {
        guard += 1
        val o = queue.dequeue()
        if (o >= 0 && o < raw.length && seen.add(o)) {
          val q = skipWs(raw, o)
          if (raw.startsWith("xref", q)) any |= loadClassic(q + 4, queue)
          else any |= loadXrefStream(q, queue)
        }
      }
      any && rootRef.isDefined
    }

    private def trailerDict(m: Map[String, PVal], queue: mutable.Queue[Int]): Unit = {
      if (rootRef.isEmpty) m.get("Root").foreach {
        case PRef(n) => rootRef = Some(n); case _ => ()
      }
      if (encryptVal.isEmpty) encryptVal = m.get("Encrypt")
      if (fileId0.isEmpty) m.get("ID").foreach {
        case PArr(PStr(b) +: _) => fileId0 = b
        case _ => ()
      }
      // hybrid-reference file: the classic trailer points at a PARALLEL
      // xref stream carrying the ObjStm entries — higher precedence
      // than /Prev, so enqueue it first
      m.get("XRefStm").foreach { case PNum(v) => queue.enqueue(v.toInt); case _ => () }
      m.get("Prev").foreach { case PNum(v) => queue.enqueue(v.toInt); case _ => () }
    }

    private def loadClassic(p0: Int, queue: mutable.Queue[Int]): Boolean = {
      var p = p0
      var ok = false
      var go = true
      while (go) {
        p = skipWs(raw, p)
        if (raw.startsWith("trailer", p)) {
          parseVal(raw, p + 7) match {
            case (PDict(m), _) => trailerDict(m, queue); ok = true
            case _ => ()
          }
          go = false
        } else {
          (for {
            (start, p1) <- parseUInt(raw, p)
            (count, p2) <- parseUInt(raw, skipWs(raw, p1))
          } yield (start, count, p2)) match {
            case None => go = false
            case Some((start, count, p2)) =>
              p = p2
              var k = 0
              while (k < count && go) {
                (for {
                  (off, q1) <- parseUInt(raw, skipWs(raw, p))
                  (_, q2) <- parseUInt(raw, skipWs(raw, q1))
                } yield (off, skipWs(raw, q2))) match {
                  case Some((off, q3)) if q3 < raw.length =>
                    if (raw.charAt(q3) == 'n') record(start + k, XInFile(off))
                    p = q3 + 1
                    ok = true
                  case _ => go = false
                }
                k += 1
              }
          }
        }
      }
      ok
    }

    private def loadXrefStream(p0: Int, queue: mutable.Queue[Int]): Boolean = {
      val parsed = for {
        (_, afterObj) <- objHeaderAt(p0)
        (dict, afterDict) = parseVal(raw, afterObj)
        m <- dict match { case PDict(m) => Some(m); case _ => None }
        if m.get("Type").contains(PName("XRef"))
        rawData <- rawStreamAt(afterDict, m, direct = true)
        data <- decodeStream(rawData, m)
      } yield (m, data)
      parsed match {
        case None => false
        case Some((m, data)) =>
          val w = m.get("W") match {
            case Some(PArr(v)) => v.collect { case PNum(x) => x.toInt }.toArray
            case _ => return false
          }
          if (w.length < 3 || w.exists(x => x < 0 || x > 8)) return false
          val size = m.get("Size") match {
            case Some(PNum(v)) => v.toInt; case _ => Int.MaxValue
          }
          val index: Vector[Int] = m.get("Index") match {
            case Some(PArr(v)) => v.collect { case PNum(x) => x.toInt }.toVector
            case _ => Vector(0, size)
          }
          val rowLen = w.sum
          var pos = 0
          index.grouped(2).foreach {
            case Vector(start, count) =>
              var k = 0
              while (k < count && pos + rowLen <= data.length) {
                val t = if (w(0) == 0) 1L else readBE(data, pos, w(0))
                val f2 = readBE(data, pos + w(0), w(1))
                val f3 = readBE(data, pos + w(0) + w(1), w(2))
                t match {
                  case 1L => record(start + k, XInFile(f2.toInt))
                  case 2L => record(start + k, XInStm(f2.toInt, f3.toInt))
                  case _ => () // free
                }
                pos += rowLen
                k += 1
              }
            case _ => ()
          }
          trailerDict(m, queue)
          true
      }
    }

    // ---- object access ----

    /** `N G obj` at `p` → (objnum, index after the obj keyword). */
    private def objHeaderAt(p0: Int): Option[(Int, Int)] =
      for {
        (num, p1) <- parseUInt(raw, skipWs(raw, p0))
        (_, p2) <- parseUInt(raw, skipWs(raw, p1))
        p3 = skipWs(raw, p2)
        if raw.startsWith("obj", p3)
      } yield (num, p3 + 3)

    /** Raw (still-encoded) stream payload following a dict that ended
      * at `afterDict`. A direct /Length is trusted when `endstream`
      * confirms it; otherwise (indirect /Length, or binary payloads
      * whose declared length lies) the lexical `endstream` bound is
      * the fallback. `direct` skips ref resolution — the xref-stream
      * bootstrap runs before any entries exist. */
    private def rawStreamAt(afterDict: Int, m: Map[String, PVal],
        direct: Boolean, depth: Int = 0): Option[Array[Byte]] = {
      val p = skipWs(raw, afterDict)
      if (!raw.startsWith("stream", p)) return None
      var ds = p + 6
      if (ds < raw.length && raw.charAt(ds) == '\r') ds += 1
      if (ds < raw.length && raw.charAt(ds) == '\n') ds += 1
      val len: Option[Int] = m.get("Length") match {
        case Some(PNum(v)) => Some(v.toInt)
        case Some(PRef(n)) if !direct => intOf(Some(PRef(n)), depth)
        case _ => None
      }
      val de = len match {
        case Some(l) if l >= 0 && ds + l <= raw.length &&
            raw.startsWith("endstream", skipWs(raw, ds + l)) => ds + l
        case _ =>
          val e = raw.indexOf("endstream", ds)
          if (e < 0) return None
          var x = e
          if (x > ds && raw.charAt(x - 1) == '\n') x -= 1
          if (x > ds && raw.charAt(x - 1) == '\r') x -= 1
          x
      }
      Some(java.util.Arrays.copyOfRange(bytes, ds, de))
    }

    /** Apply /Filter (+ /DecodeParms predictors). Only FlateDecode is
      * supported — an unsupported filter yields None and the caller
      * steps over the stream (image XObjects etc.). */
    private def decodeStream(data: Array[Byte], m: Map[String, PVal]): Option[Array[Byte]] = {
      val filters: Seq[String] = m.get("Filter") match {
        case Some(PName(n)) => Seq(n)
        case Some(PArr(v)) => v.collect { case PName(n) => n }
        case _ => Seq.empty
      }
      val parms: Seq[Option[Map[String, PVal]]] = m.get("DecodeParms") match {
        case Some(PDict(d)) => Seq(Some(d))
        case Some(PArr(v)) => v.map { case PDict(d) => Some(d); case _ => None }
        case _ => Seq.empty
      }
      filters.zipWithIndex.foldLeft(Option(data)) { case (acc, (f, i)) =>
        acc.flatMap { d =>
          def post(x: Array[Byte]): Array[Byte] =
            parms.lift(i).flatten match {
              case Some(pm) => unpredict(x,
                intOf(pm.get("Predictor"), 0).getOrElse(1),
                intOf(pm.get("Columns"), 0).getOrElse(1),
                intOf(pm.get("Colors"), 0).getOrElse(1),
                intOf(pm.get("BitsPerComponent"), 0).getOrElse(8))
              case None => x
            }
          f match {
            case "FlateDecode" | "Fl" => inflate(d, inflater).map(post)
            case "LZWDecode" | "LZW" =>
              val early = parms.lift(i).flatten
                .flatMap(pm => intOf(pm.get("EarlyChange"), 0)).getOrElse(1)
              lzwDecode(d, early).map(post)
            case _ => None
          }
        }
      }
    }

    private def intOf(v: Option[PVal], depth: Int): Option[Int] = v match {
      case Some(PNum(x)) => Some(x.toInt)
      case Some(PRef(n)) if depth < 8 => fetchVal(n, depth + 1) match {
        case Some(PNum(x)) => Some(x.toInt)
        case _ => None
      }
      case _ => None
    }

    /** The object's VALUE (dict/array/number), through ObjStm. */
    private def fetchVal(num: Int, depth: Int = 0): Option[PVal] = {
      if (depth > 16) return None
      entries.get(num).flatMap {
        case XInFile(off) =>
          objHeaderAt(off).filter(_._1 == num)
            .map { case (_, p) => parseVal(raw, p)._1 }
        case XInStm(stm, idx) =>
          loadObjStm(stm, depth).flatMap { case (text, offs) =>
            offs.lift(idx).map { case (_, o) => parseVal(text, o)._1 }
          }
        case _ => None
      }
    }

    /** Resolve the trailer's /Encrypt into a usable file key (empty
      * user password — the owner-locked shape), verifying /U BEFORE
      * any decryption so a passworded, tampered, or
      * unknown-crypt-filter document reads as UNREADABLE instead of
      * decrypting to garbage that would poison dedup keys downstream.
      * Envelope: RC4 V1/V2 R2/R3; V4 /CF crypt filters with CFM /V2
      * (RC4) or /AESV2 (AES-128-CBC, R3/R4, both /EncryptMetadata
      * shapes tried); V5 R5/R6 (AES-256-CBC via /U salts + /UE). */
    private def setupDecryption(): Unit = encryptVal.foreach { ev =>
      encUnreadable = true // until proven readable
      val em = ev match {
        case PDict(m) => Some(m)
        case PRef(n) => fetchVal(n) match {
          case Some(PDict(m)) => Some(m); case _ => None
        }
        case _ => None
      }
      for {
        m <- em
        if m.get("Filter").contains(PName("Standard"))
        v <- intOf(m.get("V"), 0)
        r <- intOf(m.get("R"), 0)
      } {
        def bytesOf(k: String): Option[Array[Byte]] = m.get(k) match {
          case Some(PStr(b)) => Some(b); case _ => None
        }
        val pOpt = m.get("P") match {
          // /P is a 32-bit mask; writers emit it signed OR unsigned
          case Some(PNum(x)) => Some((x.toLong & 0xFFFFFFFFL).toInt)
          case _ => None
        }
        /* RC4 + AESV2 share Algorithm 2/5: derive, verify /U, keep. */
        def tryRc4Family(lenBytes: Int): Option[Array[Byte]] =
          for {
            o <- bytesOf("O").filter(_.length >= 32).map(_.take(32))
            u <- bytesOf("U").filter(_.length >= 16)
            p <- pOpt
            key <- Seq(true, false).view.map { meta =>
              pdfFileKey(Array.empty, o, p, fileId0, r, lenBytes, meta)
            }.find { key =>
              val expectU = pdfUserU(key, fileId0, r)
              val checkLen = if (r == 2) 32 else 16
              expectU.take(checkLen).sameElements(u.take(checkLen))
            }
          } yield key
        if ((v == 1 || v == 2) && (r == 2 || r == 3)) {
          val lenBytes = intOf(m.get("Length"), 0).getOrElse(40) / 8
          tryRc4Family(lenBytes).foreach { key =>
            encKey = Some(key); encCfm = "RC4"; encUnreadable = false
          }
        } else if (v == 4 && (r == 3 || r == 4)) {
          // the stream crypt filter: /StmF names an entry in /CF;
          // anything but V2/AESV2 (incl. an absent /StmF) fails closed
          val cfm: Option[String] = for {
            stmf <- m.get("StmF") match {
              case Some(PName(nm)) => Some(nm); case _ => None
            }
            cf <- dictOf(m.get("CF"))
            std <- dictOf(cf.get(stmf))
            nm <- std.get("CFM") match {
              case Some(PName(x)) => Some(x); case _ => None
            }
          } yield nm
          cfm match {
            case Some(c @ ("V2" | "AESV2")) =>
              val lenBytes = intOf(m.get("Length"), 0).getOrElse(128) / 8
              tryRc4Family(lenBytes).foreach { key =>
                encKey = Some(key)
                encCfm = if (c == "AESV2") "AESV2" else "RC4"
                encUnreadable = false
              }
            case _ => ()
          }
        } else if (v == 5 && (r == 5 || r == 6)) {
          // AES-256: /U = hash(32) ∥ validation salt(8) ∥ key salt(8);
          // the file key is AES-unwrapped from /UE with the key-salt
          // hash — per-object derivation does not apply (ISO 32000-2)
          for {
            u <- bytesOf("U").filter(_.length >= 48)
            ue <- bytesOf("UE").filter(_.length >= 32)
          } {
            val hash = pdfHash2B(Array.empty, u.slice(32, 40),
              Array.empty, r)
            if (hash.sameElements(u.take(32))) {
              val ikey = pdfHash2B(Array.empty, u.slice(40, 48),
                Array.empty, r)
              try {
                val fk = aesCbc(encrypt = false, ikey,
                  new Array[Byte](16), ue.take(32), pad = false)
                encKey = Some(fk); encCfm = "AESV3"
                encUnreadable = false
              } catch { case scala.util.control.NonFatal(_) => () }
            }
          }
        }
      }
    }

    private def decrypt(num: Int, data: Array[Byte]): Array[Byte] =
      encKey match {
        case Some(k) => encCfm match {
          case "AESV2" => aesStream(pdfObjKeyAes(k, num, 0), data)
          case "AESV3" => aesStream(k, data)
          case _ => rc4(pdfObjKey(k, num, 0), data)
        }
        case None => data
      }

    /** AES stream payload: leading 16-byte IV, then CBC ciphertext
      * with PKCS#5 padding. Malformed payloads (too short, not
      * block-aligned, bad padding) yield empty — the stream is then
      * skipped by decode, never surfaced as garbage. */
    private def aesStream(key: Array[Byte], data: Array[Byte]): Array[Byte] =
      if (data.length < 32 || data.length % 16 != 0) Array.empty
      else try aesCbc(encrypt = false, key, data.take(16), data.drop(16),
        pad = true)
      catch { case scala.util.control.NonFatal(_) => Array.empty }

    /** Decoded stream payload of an in-file stream object. */
    private def fetchStream(num: Int, depth: Int = 0): Option[Array[Byte]] =
      entries.get(num) match {
        case Some(XInFile(off)) =>
          for {
            (_, p) <- objHeaderAt(off)
            (dict, afterDict) = parseVal(raw, p)
            m <- dict match { case PDict(m) => Some(m); case _ => None }
            rawData <- rawStreamAt(afterDict, m, direct = false, depth)
            decoded <- decodeStream(decrypt(num, rawData), m)
          } yield decoded
        case _ => None
      }

    /** /Type /ObjStm: decompress once, parse the N (objnum, offset)
      * header pairs; offsets become absolute into the decoded text. */
    private def loadObjStm(stm: Int, depth: Int): Option[(String, Vector[(Int, Int)])] =
      objStmCache.getOrElseUpdate(stm, {
        for {
          m <- fetchVal(stm, depth + 1) match {
            case Some(PDict(m)) if m.get("Type").contains(PName("ObjStm")) => Some(m)
            case _ => None
          }
          data <- fetchStream(stm, depth + 1)
          n <- intOf(m.get("N"), depth + 1)
          first <- intOf(m.get("First"), depth + 1)
        } yield {
          val text = new String(data, Latin1)
          val pairs = Vector.newBuilder[(Int, Int)]
          var p = 0
          var k = 0
          var ok = true
          while (k < n && ok) {
            (for {
              (onum, p1) <- parseUInt(text, skipWs(text, p))
              (off, p2) <- parseUInt(text, skipWs(text, p1))
            } yield (onum, off, p2)) match {
              case Some((onum, off, p2)) =>
                pairs += ((onum, first + off)); p = p2
              case None => ok = false
            }
            k += 1
          }
          (text, pairs.result())
        }
      })

    // ---- page tree ----

    /** Leaf page dicts in page-tree order, each paired with its
      * EFFECTIVE /Resources (own entry, else the nearest ancestor's —
      * Resources is inheritable, ISO 32000 7.8.3, and real writers
      * hoist shared font dicts to the Pages node). */
    private def walkPages(num: Int, depth: Int, visited: mutable.Set[Int],
        inhRes: Option[PVal]): Vector[(Map[String, PVal], Option[PVal])] = {
      if (depth > 32 || !visited.add(num)) return Vector.empty
      fetchVal(num) match {
        case Some(PDict(m)) =>
          val res = m.get("Resources").orElse(inhRes)
          m.get("Kids") match {
            case Some(PArr(kids)) =>
              kids.collect { case PRef(k) => k }
                .flatMap(walkPages(_, depth + 1, visited, res))
            case _ =>
              if (m.get("Type").contains(PName("Page")) || m.contains("Contents"))
                Vector((m, res))
              else Vector.empty
          }
        case _ => Vector.empty
      }
    }

    // ---- fonts ----

    private val toUniCache = mutable.HashMap.empty[Int, Option[ToUnicode]]
    // a Type0 font named a registry CMap (UniJIS/UniGB/… — tables
    // this engine does not bundle): its strings extract honest-empty,
    // and the lexical fallback must not re-surface them as mojibake
    private var sawRegistryCmap = false

    private def dictOf(v: Option[PVal]): Option[Map[String, PVal]] = v match {
      case Some(PDict(m)) => Some(m)
      case Some(PRef(n)) => fetchVal(n) match {
        case Some(PDict(m)) => Some(m); case _ => None
      }
      case _ => None
    }

    /** Font resource name → decoder for one page's effective
      * resources. Preference order per font: a /ToUnicode CMap
      * (authoritative, any font type; parsed once per document —
      * fonts are shared across pages); else a simple font's
      * `/Encoding << /Differences [...] >>` overlay (glyph names →
      * text, unmapped codes keep their base-encoding ≈Latin-1
      * meaning). Fonts with neither are absent — their strings keep
      * the default decoding. */
    private def fontMap(res: Option[PVal]): Map[String, ToUnicode] =
      (for {
        r <- dictOf(res)
        f <- dictOf(r.get("Font"))
      } yield f.flatMap { case (name, v) =>
        dictOf(Some(v)).flatMap { fd =>
          val viaCMap = fd.get("ToUnicode") match {
            case Some(PRef(tn)) => toUniCache.getOrElseUpdate(tn,
              fetchStream(tn).flatMap(d => parseToUnicode(new String(d, Latin1))))
            case _ => None
          }
          val viaDifferences = viaCMap.orElse {
            dictOf(fd.get("Encoding")).flatMap(_.get("Differences")).flatMap {
              case PArr(diffs) =>
                val m = parseDifferences(diffs)
                if (m.isEmpty) None
                else Some(ToUnicode(1, m, fallbackLatin1 = true))
              case _ => None
            }
          }
          // Type0 fonts naming a PREDEFINED CMap with no /ToUnicode:
          // the Identity variants decode 2-byte codes as UTF-16BE
          // (CID ≡ Unicode, the common subset-writer shape). The
          // registry UCS2/UTF16 encodings (UniGB-UCS2-H, UniJIS-
          // UTF16-H, …) ALSO decode as UTF-16BE passthrough — by
          // definition their code space IS Unicode (the CMap maps
          // Unicode CODES to collection CIDs purely for glyph
          // selection; ISO 32000 9.7.5.2 + the Adobe CMap resources'
          // own naming), so extraction needs no bundled CID table at
          // all. Every OTHER registry CMap (GBK-EUC, 90ms-RKSJ,
          // UniJIS-90pv legacy forms, …) has a non-Unicode code space
          // whose tables this engine does not bundle: those extract
          // honest-empty — leaking raw codes as mojibake would poison
          // dedup keys downstream.
          val viaPredefined = viaDifferences.orElse {
            (fd.get("Subtype"), fd.get("Encoding")) match {
              case (Some(PName("Type0")), Some(PName(enc))) =>
                if (enc == "Identity-H" || enc == "Identity-V" ||
                    UnicodeCodespaceCmap.matcher(enc).matches())
                  Some(ToUnicode(2, Map.empty, identityUtf16 = true))
                else {
                  sawRegistryCmap = true
                  Some(ToUnicode(2, Map.empty))
                }
              case _ => None
            }
          }
          viaPredefined.map(name -> _)
        }
      }).getOrElse(Map.empty)

    /** Full walk → Extracted, or None to trigger the lexical fallback
      * (no xref, no pages reached, or no text found — the last so a
      * damaged tree can never HIDE text the lexical scan would see). */
    def extract(): Option[Extracted] = {
      if (!load()) return None
      setupDecryption()
      // unsupported or passworded encryption: empty-on-error, and the
      // lexical fallback must NOT run (it would lex ciphertext)
      if (encUnreadable) return Some(Extracted("", 0, ok = false))
      val pageDicts = for {
        root <- rootRef.toVector
        cat <- fetchVal(root) match { case Some(PDict(m)) => Vector(m); case _ => Vector.empty }
        pagesRef <- cat.get("Pages") match { case Some(PRef(n)) => Vector(n); case _ => Vector.empty }
        pd <- walkPages(pagesRef, 0, mutable.Set.empty, None)
      } yield pd
      if (pageDicts.isEmpty) return None
      val texts = pageDicts.flatMap { case (pd, res) =>
        val contentRefs = pd.get("Contents") match {
          case Some(PRef(n)) => Seq(n)
          case Some(PArr(v)) => v.collect { case PRef(n) => n }
          case _ => Seq.empty
        }
        // multiple /Contents streams concatenate with whitespace
        // between (ISO 32000 7.8.2) before operator lexing
        val data = contentRefs.flatMap(fetchStream(_))
          .map(new String(_, Latin1)).mkString("\n")
        val fonts = try fontMap(res)
        catch { case scala.util.control.NonFatal(_) => Map.empty[String, ToUnicode] }
        val t = try textOps(data, fonts)
        catch { case scala.util.control.NonFatal(_) => "" }
        if (t.nonEmpty) Some(t) else None
      }
      if (texts.isEmpty) {
        // registry-CMap documents with no other text: honest-empty
        // (readable file, untranslatable CIDs) — returning None here
        // would hand the 2-byte codes to the lexical scan as mojibake
        if (sawRegistryCmap) Some(Extracted("", 0, ok = true)) else None
      } else Some(Extracted(texts.mkString("\n"), texts.length, ok = true))
    }
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
  def synthesize(pages: Seq[String], lzw: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val (filterName, encode): (String, Array[Byte] => Array[Byte]) =
      if (lzw) ("LZWDecode", lzwEncode(_)) else ("FlateDecode", deflateBytes)
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
      val content = encode(
        s"BT /F1 12 Tf 72 720 Td ${pdfString(text)} Tj ET".getBytes(Latin1))
      offsets(3 + n + i) = out.size()
      w(s"${3 + n + i} 0 obj << /Length ${content.length} " +
        s"/Filter /$filterName >> stream\n")
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

  /** Escaped PDF literal string for raw single-byte CODES (the
    * /Differences fixture: bytes are font codes, not text). */
  private def pdfCodeString(codes: Seq[Int]): String = {
    val b = new StringBuilder("(")
    codes.foreach {
      case c if c == '\\' => b.append("\\\\")
      case c if c == '(' => b.append("\\(")
      case c if c == ')' => b.append("\\)")
      case c if c >= 32 && c <= 126 => b.append(c.toChar)
      case c => b.append("\\%03o".format(c & 0xFF))
    }
    b.append(")").toString
  }

  /** A complete PDF whose text shows through a SIMPLE font with a
    * custom `/Encoding /Differences` overlay and NO /ToUnicode — the
    * other custom-encoding shape scanned corpora carry. Every
    * distinct character gets a remapped single-byte code whose
    * Differences entry names it as `uniXXXX`, so the bytes on disk
    * are deliberately shuffled relative to the text and only the
    * Differences walk recovers it. Resources ride on the PAGE dicts
    * here (the non-inherited placement — [[synthesizeCid]] covers
    * the inherited one). Same round-trip guarantee as
    * [[synthesize]]. */
  def synthesizeDifferences(pages: Seq[String]): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val chars: Vector[Char] = pages.flatMap(_.toSeq).distinct.sorted.toVector
    require(chars.size <= 223,
      "a /Differences overlay addresses single-byte codes (max 223 here)")
    // deliberately SHUFFLED assignment (reverse order) so identity
    // mappings cannot mask a broken overlay
    val codeOf: Map[Char, Int] =
      chars.zipWithIndex.map { case (c, i) => c -> (255 - i) }.toMap
    val size = 2 * n + 4
    val out = new java.io.ByteArrayOutputStream()
    val offsets = new Array[Int](size)
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
        s"/MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 ${2 * n + 3} 0 R >> >> " +
        s"/Contents ${3 + n + i} 0 R >> endobj\n")
    }
    pages.zipWithIndex.foreach { case (text, i) =>
      val content = deflateBytes(
        (s"BT /F1 12 Tf 72 720 Td " +
          s"${pdfCodeString(text.map(codeOf))} Tj ET").getBytes(Latin1))
      offsets(3 + n + i) = out.size()
      w(s"${3 + n + i} 0 obj << /Length ${content.length} " +
        "/Filter /FlateDecode >> stream\n")
      out.write(content)
      w("\nendstream endobj\n")
    }
    offsets(2 * n + 3) = out.size()
    // codes descend from 255, so emit entries in ASCENDING code order.
    // Glyph NAMES prefer the AGL row when one exists (alpha, Euro,
    // afii10017, ntilde — what real Type1 fonts emit) over the
    // uniXXXX numeric form, so the fixture exercises the AGL table,
    // not just the numeric decode.
    val diffs = chars.zipWithIndex.sortBy { case (_, i) => 255 - i }
      .map { case (c, i) =>
        val glyph = AglReverse.getOrElse(c, f"uni${c.toInt}%04X")
        s"${255 - i} /$glyph"
      }
      .mkString(" ")
    w(s"${2 * n + 3} 0 obj << /Type /Font /Subtype /Type1 " +
      "/BaseFont /Helvetica /Encoding << /Type /Encoding " +
      s"/Differences [ $diffs ] >> >> endobj\n")
    val xref = out.size()
    w(s"xref\n0 $size\n0000000000 65535 f \n")
    (1 until size).foreach(i => w("%010d 00000 n \n".format(offsets(i))))
    w(s"trailer << /Size $size /Root 1 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** A complete PDF 1.5 file for the same pages: the non-stream
    * objects (catalog, page tree, page dicts) live COMPRESSED inside
    * a `/Type /ObjStm` object stream, and the cross-reference is a
    * `/Type /XRef` STREAM (W [1 4 2], PNG Up predictor 12 — the
    * layout real writers emit since Acrobat 6). Content streams are
    * deliberately written in REVERSED file order while the page tree
    * stays in page order, so only a genuine xref walk (not the
    * lexical file-order scan) extracts pages in order — the property
    * q153's oracle hash-checks. Same round-trip guarantee as
    * [[synthesize]]. */
  def synthesizeModern(pages: Seq[String]): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    // numbering: 1 catalog, 2 pages, 3..n+2 page dicts (in the
    // ObjStm), n+3..2n+2 content streams, 2n+3 ObjStm, 2n+4 XRef
    val size = 2 * n + 5
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(Latin1))
    val offsets = new Array[Int](size)
    w("%PDF-1.5\n%âãÏÓ\n") // binary-content marker
    ((n - 1) to 0 by -1).foreach { i =>
      val content = deflateBytes(
        s"BT /F1 12 Tf 72 720 Td ${pdfString(pages(i))} Tj ET".getBytes(Latin1))
      offsets(n + 3 + i) = out.size()
      w(s"${n + 3 + i} 0 obj << /Length ${content.length} " +
        "/Filter /FlateDecode >> stream\n")
      out.write(content)
      w("\nendstream endobj\n")
    }
    // object stream: header of (objnum, offset) pairs, then bodies
    val bodies: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [${(0 until n).map(i => s"${3 + i} 0 R").mkString(" ")}] /Count $n >>") ++
        (0 until n).map(i => (3 + i) ->
          (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            s"/Contents ${n + 3 + i} 0 R >>"))
    val bodyOffsets = bodies.map(_._2.length + 1).scanLeft(0)(_ + _)
    val header = bodies.zip(bodyOffsets)
      .map { case ((num, _), off) => s"$num $off" }.mkString("", " ", " ")
    val stmPayload = deflateBytes(
      (header + bodies.map(_._2).mkString("", "\n", "\n")).getBytes(Latin1))
    offsets(2 * n + 3) = out.size()
    w(s"${2 * n + 3} 0 obj << /Type /ObjStm /N ${bodies.length} " +
      s"/First ${header.length} /Length ${stmPayload.length} " +
      "/Filter /FlateDecode >> stream\n")
    out.write(stmPayload)
    w("\nendstream endobj\n")
    // xref stream: rows (type[1] field2[4] field3[2]), PNG Up rows
    offsets(2 * n + 4) = out.size()
    val rowLen = 7
    val rows = new Array[Byte](size * rowLen)
    def putRow(objNum: Int, t: Int, f2: Int, f3: Int): Unit = {
      val b = objNum * rowLen
      rows(b) = t.toByte
      rows(b + 1) = (f2 >>> 24).toByte; rows(b + 2) = (f2 >>> 16).toByte
      rows(b + 3) = (f2 >>> 8).toByte; rows(b + 4) = f2.toByte
      rows(b + 5) = (f3 >>> 8).toByte; rows(b + 6) = f3.toByte
    }
    putRow(0, 0, 0, 65535)
    bodies.zipWithIndex.foreach { case ((num, _), idx) =>
      putRow(num, 2, 2 * n + 3, idx)
    }
    ((n + 3) until size).foreach(k => putRow(k, 1, offsets(k), 0))
    val filtered = new Array[Byte](size * (rowLen + 1))
    (0 until size).foreach { r =>
      filtered(r * (rowLen + 1)) = 2 // PNG Up
      (0 until rowLen).foreach { i =>
        val prev = if (r == 0) 0 else rows((r - 1) * rowLen + i)
        filtered(r * (rowLen + 1) + 1 + i) = (rows(r * rowLen + i) - prev).toByte
      }
    }
    val xrefPayload = deflateBytes(filtered)
    w(s"${2 * n + 4} 0 obj << /Type /XRef /Size $size /W [1 4 2] " +
      s"/Index [0 $size] /Root 1 0 R /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns $rowLen >> " +
      s"/Length ${xrefPayload.length} >> stream\n")
    out.write(xrefPayload)
    w("\nendstream endobj\n")
    w(s"startxref\n${offsets(2 * n + 4)}\n%%EOF\n")
    out.toByteArray
  }

  /** A complete PDF whose text shows through a Type0 (CID-keyed)
    * font: 2-byte character codes in hex strings, recoverable ONLY
    * through the font's /ToUnicode CMap stream (Identity-H — the
    * codes are synthetic glyph indices; nothing in file order is
    * Latin-1-readable text, exactly the scanned-book-corpus shape
    * the reference's pdfplumber maps,
    * /root/reference/pipeline/ingestion/drivers.py:33-50). The
    * /Resources dict rides on the PAGES node, so extraction must
    * also honor resource INHERITANCE (ISO 32000 7.8.3). The CMap is
    * spec-shaped (codespacerange + ≤100-entry bfchar blocks) and
    * FlateDecode-compressed. Same round-trip guarantee as
    * [[synthesize]]. */
  def synthesizeCid(pages: Seq[String],
      predefined: Boolean = false, registry: String = null): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val chars: Vector[Char] = pages.flatMap(_.toSeq).distinct.sorted.toVector
    require(chars.size <= 0xFFFE,
      "CID synthesis supports at most 65534 distinct characters")
    // `predefined` drops the /ToUnicode stream entirely: codes ARE
    // the UTF-16 units, and only the predefined-CMap fallback
    // recovers the text. `registry` names the /Encoding to stamp
    // (default Identity-H, CID ≡ Unicode subset-writer shape; a
    // UniXX-UCS2/UTF16 name is equally faithful — those encodings'
    // code space is DEFINED as Unicode, so UTF-16 codes are what a
    // real writer emits; an unsupported registry name produces the
    // honest-empty fixture).
    val predefEnc = Option(registry).getOrElse("Identity-H")
    require(registry == null || predefined,
      "registry encodings are the predefined (no /ToUnicode) layout")
    val codeOf: Map[Char, Int] =
      if (predefined) chars.map(c => c -> c.toInt).toMap
      else chars.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    // numbering: 1 catalog, 2 pages (+ hoisted /Resources),
    // 3..n+2 page dicts, n+3..2n+2 content streams, 2n+3 the Type0
    // font, 2n+4 its ToUnicode CMap stream (absent when predefined)
    val size = if (predefined) 2 * n + 4 else 2 * n + 5
    val out = new java.io.ByteArrayOutputStream()
    val offsets = new Array[Int](size)
    def w(s: String): Unit = out.write(s.getBytes(Latin1))
    w("%PDF-1.4\n")
    offsets(1) = out.size()
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets(2) = out.size()
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n " +
      s"/Resources << /Font << /F1 ${2 * n + 3} 0 R >> >> >> endobj\n")
    pages.indices.foreach { i =>
      offsets(3 + i) = out.size()
      w(s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents ${3 + n + i} 0 R >> endobj\n")
    }
    pages.zipWithIndex.foreach { case (text, i) =>
      val hex = text.map(c => f"${codeOf(c)}%04X").mkString
      val content = deflateBytes(
        s"BT /F1 12 Tf 72 720 Td <$hex> Tj ET".getBytes(Latin1))
      offsets(3 + n + i) = out.size()
      w(s"${3 + n + i} 0 obj << /Length ${content.length} " +
        "/Filter /FlateDecode >> stream\n")
      out.write(content)
      w("\nendstream endobj\n")
    }
    offsets(2 * n + 3) = out.size()
    if (predefined) {
      w(s"${2 * n + 3} 0 obj << /Type /Font /Subtype /Type0 " +
        s"/BaseFont /GraftCID /Encoding /$predefEnc >> endobj\n")
      val xref = out.size()
      w(s"xref\n0 $size\n0000000000 65535 f \n")
      (1 until size).foreach(i => w("%010d 00000 n \n".format(offsets(i))))
      w(s"trailer << /Size $size /Root 1 0 R >>\n" +
        s"startxref\n$xref\n%%EOF\n")
      return out.toByteArray
    }
    w(s"${2 * n + 3} 0 obj << /Type /Font /Subtype /Type0 " +
      "/BaseFont /GraftCID /Encoding /Identity-H " +
      s"/ToUnicode ${2 * n + 4} 0 R >> endobj\n")
    val cmap = {
      val sb = new StringBuilder
      sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\n")
      sb.append("begincmap\n/CMapName /GraftToUnicode def\n/CMapType 2 def\n")
      sb.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
      chars.grouped(100).foreach { grp =>
        sb.append(s"${grp.size} beginbfchar\n")
        grp.foreach { c =>
          val dst = String.valueOf(c)
            .getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
            .map("%02X".format(_)).mkString
          sb.append(f"<${codeOf(c)}%04X> <$dst>\n")
        }
        sb.append("endbfchar\n")
      }
      sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
      sb.toString
    }
    val cmapZ = deflateBytes(cmap.getBytes(Latin1))
    offsets(2 * n + 4) = out.size()
    w(s"${2 * n + 4} 0 obj << /Length ${cmapZ.length} " +
      "/Filter /FlateDecode >> stream\n")
    out.write(cmapZ)
    w("\nendstream endobj\n")
    val xref = out.size()
    w(s"xref\n0 $size\n0000000000 65535 f \n")
    (1 until size).foreach(i => w("%010d 00000 n \n".format(offsets(i))))
    w(s"trailer << /Size $size /Root 1 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** A complete encrypted PDF (Standard security handler, EMPTY user
    * password, owner password `ownerPw`) — the
    * owner-locked-but-openable shape encrypted scanned corpora
    * usually carry. `mode` picks the cipher generation:
    *
    *   - `"rc4"`   — V2/R3, RC4-128, Algorithm 1 per-object keys
    *   - `"aesv2"` — V4/R4, /CF /StdCF /CFM /AESV2 (AES-128-CBC,
    *                 per-object key + sAlT suffix, 16-byte IV,
    *                 PKCS#5 padding)
    *   - `"aesv3"` — V5/R6, /CFM /AESV3 (AES-256-CBC with the file
    *                 key directly; /U and /O carry the Algorithm-2.B
    *                 hash + salts, /UE and /OE AES-wrap the file key,
    *                 /Perms is the ECB-sealed permission block)
    *
    * Content streams are Flate-compressed then encrypted; /ID and
    * every IV/salt are deterministic digests of the pages so fixtures
    * are byte-reproducible. Same round-trip guarantee as
    * [[synthesize]] for the empty-password reader; a wrong-password
    * or unknown-crypt-filter document reads as UNREADABLE
    * (`ok = false`), never as ciphertext garbage. */
  def synthesizeEncrypted(pages: Seq[String],
      ownerPw: String = "owner", mode: String = "rc4",
      encryptMeta: Boolean = true): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    require(Set("rc4", "aesv2", "aesv3")(mode), s"unknown mode <$mode>")
    val n = pages.length
    val encObjNum = 2 * n + 3
    val size = 2 * n + 4
    val id0 = md5(pages.mkString(" ").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    val perms = -3904 // print+copy denied to non-owners: a typical mask
    def hex(b: Array[Byte]): String =
      b.map("%02X".format(_)).mkString("<", "", ">")
    def iv(objNum: Int): Array[Byte] =
      md5(id0, Array(objNum.toByte, (objNum >> 8).toByte, mode.length.toByte))
    // (encrypt-one-object, /Encrypt dict body) per mode
    val (encObj, encDict): ((Int, Array[Byte]) => Array[Byte], String) =
      mode match {
        case "rc4" =>
          val r = 3
          val o = pdfOwnerO(ownerPw.getBytes(Latin1), Array.empty, r, 16)
          val key = pdfFileKey(Array.empty, o, perms, id0, r, 16)
          val u = pdfUserU(key, id0, r)
          (((num, data) => rc4(pdfObjKey(key, num, 0), data)),
            s"/Filter /Standard /V 2 /R 3 /Length 128 " +
              s"/P $perms /O ${hex(o)} /U ${hex(u)}")
        case "aesv2" =>
          val r = 4
          val o = pdfOwnerO(ownerPw.getBytes(Latin1), Array.empty, r, 16)
          // R4's key derivation folds /EncryptMetadata false into the
          // digest input — the shape the reader's both-ways probe covers
          val key = pdfFileKey(Array.empty, o, perms, id0, r, 16,
            encryptMeta)
          val u = pdfUserU(key, id0, r)
          val metaEntry =
            if (encryptMeta) "" else "/EncryptMetadata false "
          (((num, data) => {
            val v = iv(num)
            v ++ aesCbc(encrypt = true, pdfObjKeyAes(key, num, 0), v,
              data, pad = true)
          }),
            s"/Filter /Standard /V 4 /R 4 /Length 128 " +
              "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
              s"/StmF /StdCF /StrF /StdCF $metaEntry/P $perms " +
              s"/O ${hex(o)} /U ${hex(u)}")
        case _ => // aesv3
          val r = 6
          val pw = ownerPw.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val fileKey = sha2(256, "graft aes256 file key".getBytes(Latin1), id0)
          val vsalt = md5(id0, Array('v'.toByte)).take(8)
          val ksalt = md5(id0, Array('k'.toByte)).take(8)
          val u = pdfHash2B(Array.empty, vsalt, Array.empty, r) ++
            vsalt ++ ksalt
          val ue = aesCbc(encrypt = true,
            pdfHash2B(Array.empty, ksalt, Array.empty, r),
            new Array[Byte](16), fileKey, pad = false)
          val ovsalt = md5(id0, Array('V'.toByte)).take(8)
          val oksalt = md5(id0, Array('K'.toByte)).take(8)
          val o = pdfHash2B(pw, ovsalt, u, r) ++ ovsalt ++ oksalt
          val oe = aesCbc(encrypt = true, pdfHash2B(pw, oksalt, u, r),
            new Array[Byte](16), fileKey, pad = false)
          val permsBlock = aesEcb(encrypt = true, fileKey,
            pLe(perms) ++ Array.fill[Byte](4)(0xFF.toByte) ++
              "Tadb".getBytes(Latin1) ++ md5(id0).take(4))
          (((num, data) => {
            val v = iv(num)
            v ++ aesCbc(encrypt = true, fileKey, v, data, pad = true)
          }),
            s"/Filter /Standard /V 5 /R 6 /Length 256 " +
              "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
              s"/StmF /StdCF /StrF /StdCF /P $perms " +
              s"/O ${hex(o)} /U ${hex(u)} " +
              s"/OE ${hex(oe)} /UE ${hex(ue)} /Perms ${hex(permsBlock)}")
      }
    val out = new java.io.ByteArrayOutputStream()
    val offsets = new Array[Int](size)
    def w(s: String): Unit = out.write(s.getBytes(Latin1))
    w(if (mode == "rc4") "%PDF-1.4\n" else "%PDF-1.6\n")
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
      val objNum = 3 + n + i
      val content = encObj(objNum, deflateBytes(
        s"BT /F1 12 Tf 72 720 Td ${pdfString(text)} Tj ET".getBytes(Latin1)))
      offsets(objNum) = out.size()
      w(s"$objNum 0 obj << /Length ${content.length} " +
        "/Filter /FlateDecode >> stream\n")
      out.write(content)
      w("\nendstream endobj\n")
    }
    offsets(encObjNum) = out.size()
    w(s"$encObjNum 0 obj << $encDict >> endobj\n")
    val xref = out.size()
    w(s"xref\n0 $size\n0000000000 65535 f \n")
    (1 until size).foreach(i => w("%010d 00000 n \n".format(offsets(i))))
    w(s"trailer << /Size $size /Root 1 0 R /Encrypt $encObjNum 0 R " +
      s"/ID [${hex(id0)} ${hex(id0)}] >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** Distributed fixture/export writer: one synthesized PDF per input
    * row into `dir` as `<name>.pdf`. Files are written executor-side
    * through the Hadoop FS API (works on local paths and HDFS alike);
    * bytes never hit the driver. Input: (name, pages). `modern` picks
    * the PDF 1.5 layout ([[synthesizeModern]]); `cid` the Type0/CID
    * ToUnicode layout ([[synthesizeCid]]); `differences` the
    * simple-font /Encoding overlay ([[synthesizeDifferences]]);
    * `lzw` swaps the classic layout's content filter to LZWDecode;
    * `encrypted` writes the owner-locked layout
    * ([[synthesizeEncrypted]]) with `encryptMode` picking the cipher
    * generation (`"rc4"`, `"aesv2"`, `"aesv3"`); `cidPredefined`
    * writes the Type0 layout with NO /ToUnicode (predefined-CMap
    * fallback required), stamping `cidRegistry` as the /Encoding
    * when given (e.g. `"UniGB-UCS2-H"`; default Identity-H). */
  def writePdfDir(rows: Dataset[(String, Seq[String])], dir: String,
      modern: Boolean = false, cid: Boolean = false,
      differences: Boolean = false, lzw: Boolean = false,
      encrypted: Boolean = false, encryptMode: String = "rc4",
      cidPredefined: Boolean = false, cidRegistry: String = null): Unit = {
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
        val bytes =
          if (cid || cidPredefined)
            synthesizeCid(pages, cidPredefined, cidRegistry)
          else if (differences) synthesizeDifferences(pages)
          else if (encrypted) synthesizeEncrypted(pages, mode = encryptMode)
          else if (modern) synthesizeModern(pages)
          else synthesize(pages, lzw)
        try os.write(bytes) finally os.close()
      }
    }
  }
}
