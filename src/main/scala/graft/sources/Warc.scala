package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) container source — the format 100 TB web crawls
  * actually arrive in (Common Crawl et al.). An engine extension: the
  * reference fetches loose documents over HTTP
  * (pipeline/ingestion/drivers/driver_bible.py:23-36) and never reads
  * archived crawl containers.
  *
  * Reader semantics:
  *  - plain `.warc` and `.warc.gz` with ONE GZIP MEMBER PER RECORD
  *    (the standard layout — `java.util.zip.GZIPInputStream` decodes
  *    concatenated members natively); sniffed by magic bytes, not
  *    file name;
  *  - each record's header block is parsed case-insensitively;
  *    the payload is `Content-Length` bytes, exactly;
  *  - `response` records carrying `application/http` payloads are
  *    split into status / headers / body, and a
  *    `Transfer-Encoding: chunked` body is de-chunked (raw captures
  *    store the wire form);
  *  - a malformed tail (truncation, bad header, missing
  *    Content-Length) terminates the file HONESTLY: every record
  *    parsed before it is kept and one `invalid` sentinel row with
  *    `warc_ok = false` marks the break — never silent drop, never
  *    fabricated text.
  *
  * Scale shape: one `mapPartitions` byte codec over a `binaryFile`
  * scan ([[graft.operators.Multimodal.readBinaryDir]]) — per-file
  * work proportional to bytes, records never leave the executor
  * un-projected, and the downstream (silver text via
  * [[graft.functions.web.html_main_text]], dedup, quality) is plain
  * column work over the exploded rows.
  */
object Warc {

  final case class WarcFile(path: String, content: Array[Byte])

  /** One parsed record. `http_status` is -1 and `body` the raw block
    * for non-HTTP records (warcinfo, request, metadata); `warc_ok` is
    * false only on the per-file `invalid` sentinel. */
  final case class WarcRow(
      path: String, rec_index: Int, warc_type: String,
      target_uri: String, warc_date: String, record_id: String,
      http_status: Int, http_content_type: String,
      body: Array[Byte], n_bytes: Long, warc_ok: Boolean)

  /** Directory of WARC files → one row per record. */
  def readWarcDir(spark: SparkSession, path: String,
      glob: String = "*.warc*"): Dataset[WarcRow] = {
    import spark.implicits._
    val raw = graft.operators.Multimodal.readBinaryDir(spark, path, glob)
      .select(col("path"), col("content")).as[WarcFile]
    raw.mapPartitions(_.flatMap(f => parse(f.path, f.content)))
  }

  private val CRLF = "\r\n"
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  private def isGzip(b: Array[Byte]): Boolean =
    b.length > 2 && (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B

  /** All concatenated gzip members, decoded back to back. */
  private[sources] def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    try in.readAllBytes() finally in.close()
  }

  /** Parse one WARC file (already-fetched bytes). Total: returns the
    * records up to the first malformation plus an `invalid` sentinel
    * (exceptions included — a corrupt gzip stream must not kill the
    * task). */
  def parse(path: String, bytes: Array[Byte]): Seq[WarcRow] =
    try parseInner(path, bytes)
    catch {
      case _: Exception =>
        Vector(invalid(path, 0))
    }

  private def invalid(path: String, idx: Int): WarcRow =
    WarcRow(path, idx, "invalid", null, null, null, -1, null,
      Array.empty[Byte], 0L, warc_ok = false)

  private def parseInner(path: String, raw: Array[Byte]): Seq[WarcRow] = {
    val data = if (isGzip(raw)) gunzipAll(raw) else raw
    val out = Vector.newBuilder[WarcRow]
    var i = 0
    var idx = 0
    var broken = false
    while (!broken && i < data.length) {
      // skip inter-record blank lines
      while (i < data.length && (data(i) == '\r' || data(i) == '\n')) i += 1
      if (i < data.length) {
        val headEnd = indexOfBlankLine(data, i)
        if (headEnd < 0) broken = true
        else {
          val head = new String(data, i, headEnd - i, Latin1)
          val lines = head.split("\r?\n").toSeq
          if (!lines.headOption.exists(_.startsWith("WARC/"))) broken = true
          else {
            val h = headerMap(lines.tail)
            h.get("content-length").flatMap(_.toLongOption) match {
              case None => broken = true
              case Some(len) =>
                val bodyStart = headEnd + blankWidth(data, headEnd)
                if (bodyStart + len > data.length) broken = true
                else {
                  val block = java.util.Arrays.copyOfRange(
                    data, bodyStart, bodyStart + len.toInt)
                  out += toRow(path, idx, h, block)
                  idx += 1
                  i = bodyStart + len.toInt
                }
            }
          }
        }
      }
    }
    if (broken) out += invalid(path, idx)
    out.result()
  }

  /** Index of the `\r\n\r\n` header terminator (`\n\n` tolerated),
    * pointing at the FIRST byte of the terminating sequence. */
  private def indexOfBlankLine(d: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < d.length) {
      if (d(i) == '\r' && i + 3 < d.length && d(i + 1) == '\n' &&
          d(i + 2) == '\r' && d(i + 3) == '\n') return i
      if (d(i) == '\n' && d(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Byte width of the header terminator at `at` (4 for CRLFCRLF,
    * 2 for LFLF). */
  private def blankWidth(d: Array[Byte], at: Int): Int =
    if (d(at) == '\r') 4 else 2

  private def headerMap(lines: Seq[String]): Map[String, String] =
    lines.flatMap { l =>
      val j = l.indexOf(':')
      if (j <= 0) None
      else Some(l.substring(0, j).trim.toLowerCase ->
        l.substring(j + 1).trim)
    }.toMap

  private def toRow(path: String, idx: Int, h: Map[String, String],
      block: Array[Byte]): WarcRow = {
    val wtype = h.getOrElse("warc-type", "unknown").toLowerCase
    val uri = h.get("warc-target-uri").orNull
    val date = h.get("warc-date").orNull
    val rid = h.get("warc-record-id").orNull
    val isHttpResp = wtype == "response" &&
      h.get("content-type").exists(_.toLowerCase.startsWith("application/http"))
    if (!isHttpResp)
      WarcRow(path, idx, wtype, uri, date, rid, -1, null, block,
        block.length.toLong, warc_ok = true)
    else parseHttp(block) match {
      case Some((status, ct, body)) =>
        WarcRow(path, idx, wtype, uri, date, rid, status, ct, body,
          body.length.toLong, warc_ok = true)
      case None => // response record whose HTTP block is malformed:
        // keep the raw bytes, flag it — honesty over fabrication
        WarcRow(path, idx, wtype, uri, date, rid, -1, null, block,
          block.length.toLong, warc_ok = false)
    }
  }

  /** Split an `application/http; msgtype=response` block into
    * (status, content-type, de-chunked body). */
  private def parseHttp(block: Array[Byte]): Option[(Int, String, Array[Byte])] = {
    val headEnd = indexOfBlankLine(block, 0)
    if (headEnd < 0) return None
    val head = new String(block, 0, headEnd, Latin1)
    val lines = head.split("\r?\n").toSeq
    val status = lines.headOption
      .filter(_.startsWith("HTTP/"))
      .flatMap(_.split(" ").lift(1)).flatMap(_.toIntOption)
    if (status.isEmpty) return None
    val h = headerMap(lines.tail)
    val raw = java.util.Arrays.copyOfRange(block,
      headEnd + blankWidth(block, headEnd), block.length)
    val body =
      if (h.get("transfer-encoding").exists(_.toLowerCase.contains("chunked")))
        dechunk(raw).getOrElse(return None)
      else raw
    Some((status.get, h.get("content-type").orNull, body))
  }

  /** RFC 9112 §7.1 chunked decoding (sizes in hex, terminal 0-chunk;
    * chunk extensions tolerated, trailers ignored). */
  private[graft] def dechunk(raw: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var done = false
    while (!done) {
      val eol = indexOfEol(raw, i)
      if (eol < 0) return None
      val sizeStr = new String(raw, i, eol - i, Latin1)
        .takeWhile(c => c != ';').trim
      val size = try Integer.parseInt(sizeStr, 16)
        catch { case _: NumberFormatException => return None }
      val start = eol + (if (raw(eol) == '\r') 2 else 1)
      if (size == 0) done = true
      else {
        if (start + size > raw.length) return None
        out.write(raw, start, size)
        var j = start + size // skip the chunk's trailing CRLF
        if (j < raw.length && raw(j) == '\r') j += 1
        if (j < raw.length && raw(j) == '\n') j += 1
        i = j
      }
    }
    Some(out.toByteArray)
  }

  private def indexOfEol(d: Array[Byte], from: Int): Int = {
    var i = from
    while (i < d.length) {
      if (d(i) == '\r' || d(i) == '\n') return i
      i += 1
    }
    -1
  }

  // ---- deterministic fixture writer ----

  /** One WARC file's bytes from (url, bodyText) entries: a `warcinfo`
    * record then one HTTP 200 `response` per entry. `chunkEvery` > 0
    * stores every chunkEvery-th response in Transfer-Encoding:
    * chunked wire form (split into two chunks); `gzip` writes one
    * gzip member PER RECORD (the standard .warc.gz layout).
    * Deterministic throughout — no clocks, no randomness. */
  def synthesizeWarc(entries: Seq[(String, String)], gzip: Boolean = false,
      chunkEvery: Int = 0,
      contentType: String = "text/plain; charset=utf-8",
      bodyCharset: String = "UTF-8"): Array[Byte] = {
    val bodyCs = java.nio.charset.Charset.forName(bodyCharset)
    def record(headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
      val head = ("WARC/1.0" +: headers.map { case (k, v) => s"$k: $v" })
        .mkString("", CRLF, CRLF)
      val b = new java.io.ByteArrayOutputStream()
      b.write(head.getBytes(Latin1))
      b.write(CRLF.getBytes(Latin1))
      b.write(body)
      b.write((CRLF + CRLF).getBytes(Latin1))
      b.toByteArray
    }
    val info = {
      val body = s"software: graft-warc-fixture$CRLF".getBytes(Utf8)
      record(Seq(
        "WARC-Type" -> "warcinfo",
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "WARC-Record-ID" -> "<urn:graft:warcinfo:0>",
        "Content-Type" -> "application/warc-fields",
        "Content-Length" -> body.length.toString), body)
    }
    val recs = info +: entries.zipWithIndex.map { case ((url, text), k) =>
      val payload = text.getBytes(bodyCs)
      val chunked = chunkEvery > 0 && k % chunkEvery == 0
      val body =
        if (!chunked) payload
        else { // two chunks: first half, remainder, terminal 0
          val half = payload.length / 2
          val b = new java.io.ByteArrayOutputStream()
          def chunk(off: Int, len: Int): Unit = {
            b.write(Integer.toHexString(len).getBytes(Latin1))
            b.write(CRLF.getBytes(Latin1))
            b.write(payload, off, len)
            b.write(CRLF.getBytes(Latin1))
          }
          chunk(0, half); chunk(half, payload.length - half)
          b.write(s"0$CRLF$CRLF".getBytes(Latin1))
          b.toByteArray
        }
      val httpHead = (Seq("HTTP/1.1 200 OK",
        s"Content-Type: $contentType") ++
        (if (chunked) Seq("Transfer-Encoding: chunked")
         else Seq(s"Content-Length: ${payload.length}")))
        .mkString("", CRLF, CRLF + CRLF)
      val http = httpHead.getBytes(Latin1) ++ body
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> url,
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "WARC-Record-ID" -> s"<urn:graft:record:${k + 1}>",
        "Content-Type" -> "application/http; msgtype=response",
        "Content-Length" -> http.length.toString), http)
    }
    if (!gzip) recs.flatten.toArray
    else recs.flatMap { r => // one member per record
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(r); gz.close()
      bos.toByteArray.toSeq
    }.toArray
  }

  /** Fixture-dir writer: one WARC file per input row
    * (fileName, entries). Same distributed shape as `Pdf.writePdfDir`
    * (Hadoop FS, session conf shipped, partition spread); `clean`
    * false lets a second call add files — e.g. a gzip batch beside a
    * plain batch in one scan dir. */
  def writeWarcDir(files: Dataset[(String, Seq[(String, String)])],
      dir: String, gzip: Boolean = false, chunkEvery: Int = 0,
      clean: Boolean = true,
      contentType: String = "text/plain; charset=utf-8",
      bodyCharset: String = "UTF-8"): Unit = {
    val spark = files.sparkSession
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fsSetup = hp.getFileSystem(spark.sessionState.newHadoopConf())
    if (clean) fsSetup.delete(hp, true)
    fsSetup.mkdirs(hp)
    val par = spark.sparkContext.defaultParallelism
    val spread =
      if (files.rdd.getNumPartitions < math.max(2, par / 2))
        files.repartition(par)
      else files
    val confKv: Array[(String, String)] = {
      import scala.jdk.CollectionConverters._
      fsSetup.getConf.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray
    }
    val ext = if (gzip) ".warc.gz" else ".warc"
    spread.foreachPartition { it: Iterator[(String, Seq[(String, String)])] =>
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confKv.foreach { case (k, v) => conf.set(k, v) }
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      it.foreach { case (name, entries) =>
        val os = fs.create(
          new org.apache.hadoop.fs.Path(dir, s"$name$ext"), true)
        try os.write(synthesizeWarc(entries, gzip, chunkEvery, contentType,
          bodyCharset))
        finally os.close()
      }
    }
  }
}
