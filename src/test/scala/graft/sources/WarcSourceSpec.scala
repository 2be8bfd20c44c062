package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

/** Spec-truth framing fixtures: hand-built byte streams, NOT produced by
  * the q177b builder — the length-driven splitter must survive bodies
  * that CONTAIN the record magic, inter-record noise, and truncation. */
class WarcSourceSpec extends SparkSpec {

  private def rec(wtype: String, body: String, id: String = "x"): String =
    "WARC/1.0\r\n" +
      s"WARC-Type: $wtype\r\n" +
      s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
      s"Content-Length: ${body.getBytes(UTF_8).length}\r\n\r\n" +
      body + "\r\n\r\n"

  test("length-driven: a body containing the record magic does NOT split") {
    val decoy = "see WARC/1.0\r\nWARC-Type: fake\r\n\r\ninside a page about warc"
    val stream = (rec("response", decoy, "1") + rec("response", "plain", "2"))
      .getBytes(UTF_8)
    val got = WarcSource.splitRecords(stream)
    assert(got.size == 2, got.map(_.take(40)).toString)
    assert(got.head.contains("see WARC/1.0") && got.head.contains("uuid:1"))
    assert(got(1).contains("uuid:2") && !got(1).contains("fake"))
  }

  test("resync: inter-record noise skipped, malformed/truncated records isolated") {
    val noise = "\n\n--not warc--\n"
    val truncated = "WARC/1.0\r\nWARC-Type: resp" // no blank line, no length
    val stream = (noise + rec("response", "a", "1") + noise +
      truncated + rec("metadata", "bb", "2") +
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999\r\n\r\nshort")
      .getBytes(UTF_8)
    val got = WarcSource.splitRecords(stream)
    assert(got.size == 4, got.map(_.take(30)).toString)
    assert(got(0).contains("uuid:1"))
    assert(got(1) == truncated, got(1)) // resync ends it at the next magic
    assert(got(2).contains("uuid:2"))
    assert(got(3).endsWith("short"), "declared length past EOF -> resync to EOF")
    // garbage before the first magic is skipped, not globbed
    assert(!got(0).contains("not warc"))
  }

  test("empty / magic-free / truncated-header streams never throw") {
    assert(WarcSource.splitRecords(Array.empty[Byte]).isEmpty)
    assert(WarcSource.splitRecords("no records here".getBytes(UTF_8)).isEmpty)
    assert(WarcSource.splitRecords("WARC/1.0\r\n".getBytes(UTF_8)) ==
      Seq("WARC/1.0\r\n"))
  }

  private def gzMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private def recBytes(body: Array[Byte], id: String): Array[Byte] = {
    val hdr = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    hdr ++ body ++ "\r\n\r\n".getBytes(UTF_8)
  }

  test("byte-true framing: multi-byte UTF-8 and BINARY bodies slice by octets") {
    // é (2B) + 中 (3B) + an INVALID UTF-8 byte body — char counting
    // would misframe both
    val utf8Body = "café 中".getBytes(UTF_8) // 9 bytes, 6 chars
    val binBody = Array[Byte](0x00, -1, -2, 'W', 'A', 'R', 'C')
    val stream = recBytes(utf8Body, "1") ++ recBytes(binBody, "2")
    val dir = java.nio.file.Files.createTempDirectory("warcbytes")
    java.nio.file.Files.write(dir.resolve("a.warc"), stream)
    import org.apache.spark.sql.functions._
    val parsed = graft.operators.Warc.warcParseBytes(
        WarcSource.readWarcRecordsBinary(spark, dir.toString),
        "rec_no", "rec_bin")
      .orderBy(col("rec_no")).collect()
    assert(parsed.length == 2)
    val r1 = parsed(0)
    assert(r1.getLong(7) == 9L, "body_len counts OCTETS")
    assert(r1.getLong(8) == 6L, "n_chars counts code points")
    assert(r1.getBoolean(10) && r1.getBoolean(11), "utf8 + valid")
    val r2 = parsed(1)
    assert(r2.getLong(7) == 7L)
    assert(r2.isNullAt(8), "binary body refuses the text view")
    assert(!r2.getBoolean(10), "body_is_utf8 = false")
    assert(r2.getBoolean(11), "framing itself is valid")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(binBody).map("%02x".format(_)).mkString
    assert(r2.getString(9) == md5, "md5 over the exact bytes")
  }

  test(".warc.gz: one gzip member per record (the Common Crawl shape)") {
    val stream = gzMember(recBytes("hello".getBytes(UTF_8), "7")) ++
      gzMember(recBytes("world!".getBytes(UTF_8), "8"))
    val dir = java.nio.file.Files.createTempDirectory("warcgz")
    java.nio.file.Files.write(dir.resolve("a.warc.gz"), stream)
    import org.apache.spark.sql.functions._
    val parsed = graft.operators.Warc.warcParseBytes(
        WarcSource.readWarcRecordsBinary(spark, dir.toString),
        "rec_no", "rec_bin")
      .orderBy(col("rec_no")).collect()
    assert(parsed.length == 2, parsed.mkString("\n"))
    assert(parsed(0).getString(4) == "<urn:uuid:7>" &&
      parsed(0).getLong(7) == 5L && parsed(0).getBoolean(11))
    assert(parsed(1).getString(4) == "<urn:uuid:8>" &&
      parsed(1).getLong(7) == 6L && parsed(1).getBoolean(11))
  }

  test("gunzipMembers: sloppy multi-record member, truncated member, trailing garbage") {
    val r1 = recBytes("a".getBytes(UTF_8), "1")
    val r2 = recBytes("bb".getBytes(UTF_8), "2")
    // one member holding TWO records still frames (framing never
    // relies on member==record)
    val multi = gzMember(r1 ++ r2)
    assert(WarcSource.splitRecordBytes(
      WarcSource.gunzipMembers(multi)).size == 2)
    // truncated second member: first member's bytes survive
    val good = gzMember(r1)
    val bad = gzMember(r2).dropRight(12)
    val out = WarcSource.gunzipMembers(good ++ bad)
    assert(out.length >= r1.length,
      "first member fully recovered")
    assert(new String(WarcSource.splitRecordBytes(out).head, UTF_8)
      .contains("uuid:1"))
    // trailing non-gzip garbage after the last member is dropped
    val junk = WarcSource.gunzipMembers(good ++ "not gzip".getBytes(UTF_8))
    assert(junk.toSeq == r1.toSeq)
    // never throws on junk-only input
    assert(WarcSource.gunzipMembers("junk".getBytes(UTF_8)).isEmpty)
  }

  test("binary sink: raw and gzip-member part files round-trip arbitrary bytes") {
    import spark.implicits._
    val bodies = Seq(
      "plain ascii".getBytes(UTF_8),
      "café 中".getBytes(UTF_8), // multi-byte UTF-8
      Array[Byte](0x00, -128, -1, 0x1f, -117.toByte, 8)) // binary incl. gzip magic
    val recs = bodies.zipWithIndex.map { case (b, i) => recBytes(b, i.toString) }
    def roundTrip(gzip: Boolean): Seq[(String, Long, String)] = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"warcsink$gzip").toString
      WarcSource.writeWarcRecordsBinary(
        recs.toDF("rec_bin").repartition(2), "rec_bin", dir,
        gzipPerRecord = gzip)
      import org.apache.spark.sql.functions._
      graft.operators.Warc.warcParseBytes(
          WarcSource.readWarcRecordsBinary(spark, dir), "rec_no", "rec_bin")
        .collect()
        .map(r => (r.getString(4), r.getLong(7), r.getString(9))).toSeq
    }
    val md5s = bodies.map(b => java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString)
    val expect = bodies.indices.map(i =>
      (s"<urn:uuid:$i>", bodies(i).length.toLong, md5s(i))).toSet
    assert(roundTrip(gzip = false).toSet == expect, "raw .warc sink")
    assert(roundTrip(gzip = true).toSet == expect, ".warc.gz member sink")
  }

  test("readWarcRecords: per-file framing through the binaryFile source") {
    val dir = java.nio.file.Files.createTempDirectory("warcsrc")
    val f = dir.resolve("a.warc")
    java.nio.file.Files.write(f,
      (rec("response", "hello", "7") + rec("request", "ignored", "8"))
        .getBytes(UTF_8))
    val rows = WarcSource.readWarcRecords(spark, dir.toString)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(rows.length == 2)
    assert(rows.find(_._1 == 0L).get._2.contains("uuid:7"))
    assert(rows.find(_._1 == 1L).get._2.contains("uuid:8"))
    // and the operator layer parses what the source framed
    import org.apache.spark.sql.functions._
    val parsed = graft.operators.Warc.warcParse(
        WarcSource.readWarcRecords(spark, dir.toString), "rec_no", "rec")
      .orderBy(col("rec_no")).collect()
    assert(parsed(0).getString(2) == "response" &&
      parsed(0).getLong(7) == 5L && parsed(0).getBoolean(9))
    assert(parsed(1).getString(2) == "request" && parsed(1).getBoolean(9))
  }
}
