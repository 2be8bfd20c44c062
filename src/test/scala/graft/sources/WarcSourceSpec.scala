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
