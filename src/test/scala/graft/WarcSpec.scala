package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** WARC container reader: record walk, per-record gzip members,
  * chunked transfer decoding, honest truncation/malformation
  * sentinels, and the distributed dir round-trip. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val entries = Seq(
    "http://e.com/a" -> "primer documento de prueba",
    "http://e.com/b" -> "segundo documento con acentos: canción niño",
    "http://e.com/c" -> "tercero")

  private def bodies(rows: Seq[Warc.WarcRow]): Seq[(String, String)] =
    rows.filter(_.warc_type == "response")
      .sortBy(_.rec_index)
      .map(r => (r.target_uri, new String(r.body, "UTF-8")))

  test("plain round-trip: warcinfo + responses, exact bodies, utf-8 lengths") {
    val rows = Warc.parse("f.warc", Warc.synthesizeWarc(entries))
    assert(rows.map(_.warc_type) === Seq("warcinfo", "response",
      "response", "response"))
    assert(rows.forall(_.warc_ok))
    assert(bodies(rows) === entries)
    assert(rows(1).http_status === 200)
    assert(rows(1).http_content_type === "text/plain; charset=utf-8")
    assert(rows(2).n_bytes ===
      entries(1)._2.getBytes("UTF-8").length.toLong,
      "Content-Length counts BYTES, not chars")
  }

  test("gzip: one member per record, sniffed by magic, same rows") {
    val gz = Warc.synthesizeWarc(entries, gzip = true)
    assert((gz(0) & 0xFF) === 0x1F && (gz(1) & 0xFF) === 0x8B)
    val rows = Warc.parse("f.warc.gz", gz)
    assert(rows.count(_.warc_type == "response") === 3)
    assert(bodies(rows) === entries)
  }

  test("chunked transfer encoding is de-chunked to the exact body") {
    val rows = Warc.parse("f.warc",
      Warc.synthesizeWarc(entries, chunkEvery = 1))
    assert(rows.forall(_.warc_ok))
    assert(bodies(rows) === entries)
  }

  test("dechunk: extensions tolerated, bad hex refused") {
    val wire = "5;ext=v\r\nhello\r\n3\r\n y!\r\n0\r\n\r\n".getBytes("ISO-8859-1")
    assert(Warc.dechunk(wire).map(new String(_, "UTF-8")) === Some("hello y!"))
    assert(Warc.dechunk("zz\r\nxx\r\n0\r\n\r\n".getBytes("ISO-8859-1")).isEmpty)
  }

  test("truncation keeps parsed records and appends an invalid sentinel") {
    val full = Warc.synthesizeWarc(entries)
    val rows = Warc.parse("t.warc", full.dropRight(12))
    val resp = rows.filter(r => r.warc_type == "response" && r.warc_ok)
    assert(resp.size === 2, "the cut record must not survive")
    assert(rows.last.warc_type === "invalid" && !rows.last.warc_ok)
  }

  test("missing Content-Length terminates honestly") {
    val bad = ("WARC/1.0\r\nWARC-Type: metadata\r\n\r\nbody").getBytes("UTF-8")
    val rows = Warc.parse("m.warc", bad)
    assert(rows.size === 1 && rows.head.warc_type === "invalid")
  }

  test("non-HTTP records pass their raw block through, status -1") {
    val block = "key: value\r\n".getBytes("UTF-8")
    val rec = ("WARC/1.0\r\nWARC-Type: request\r\n" +
      "WARC-Target-URI: http://e.com/a\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes("UTF-8") ++
      block ++ "\r\n\r\n".getBytes("UTF-8")
    val rows = Warc.parse("r.warc", rec)
    assert(rows.size === 1)
    assert(rows.head.warc_type === "request")
    assert(rows.head.http_status === -1)
    assert(rows.head.body.toSeq === block.toSeq)
    assert(rows.head.warc_ok)
  }

  test("a response whose HTTP block is malformed keeps bytes, flags warc_ok=false") {
    val block = "NOT-HTTP garbage".getBytes("UTF-8")
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://e.com/x\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes("UTF-8") ++
      block ++ "\r\n\r\n".getBytes("UTF-8")
    val rows = Warc.parse("x.warc", rec)
    assert(rows.size === 1 && !rows.head.warc_ok)
    assert(rows.head.body.toSeq === block.toSeq)
  }

  test("readWarcDir: distributed write + scan over mixed plain/gz files") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-warc").toString
    Warc.writeWarcDir(Seq(("f0", entries.take(2))).toDS(), dir)
    Warc.writeWarcDir(Seq(("f1", entries.drop(2))).toDS(), dir,
      gzip = true, chunkEvery = 1, clean = false)
    val rows = Warc.readWarcDir(spark, dir).collect().toSeq
    assert(rows.count(_.warc_type == "warcinfo") === 2)
    val got = rows.filter(_.warc_type == "response")
      .map(r => (r.target_uri, new String(r.body, "UTF-8"))).toSet
    assert(got === entries.toSet)
    assert(rows.forall(_.warc_ok))
  }
}
