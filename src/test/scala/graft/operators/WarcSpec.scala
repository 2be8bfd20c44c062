package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Spec-truth WARC fixtures hand-written from ISO 28500 — NOT produced
  * by q177's own corpus builder, so a matched build⊗parse bug cannot
  * pass here. */
class WarcSpec extends SparkSpec {

  private val CRLF = "\r\n"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def parse(recs: (Long, String)*) = {
    import spark.implicits._
    Warc.warcParse(recs.toSeq.toDF("id", "rec"), "id", "rec")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("full response record: every field at its spec position") {
    val body = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"
    val rec = "WARC/1.0" + CRLF +
      "WARC-Type: response" + CRLF +
      "WARC-Record-ID: <urn:uuid:abc>" + CRLF +
      "WARC-Target-URI: http://example.com/a" + CRLF +
      "Content-Length: " + body.length + CRLF + CRLF +
      body + CRLF + CRLF
    val r = parse(1L -> rec)(1L)
    assert(r.getString(1) == "1.0")
    assert(r.getString(2) == "response")
    assert(r.getString(3) == "http://example.com/a")
    assert(r.getString(4) == "<urn:uuid:abc>")
    assert(r.getLong(5) == body.length.toLong)
    assert(r.getLong(6) == 4L, "four header fields")
    assert(r.getLong(7) == body.length.toLong)
    assert(r.getString(8) == md5hex(body))
    assert(r.getBoolean(9), "valid")
  }

  test("header names are case-insensitive; body containing CRLFCRLF is bounded by Content-Length") {
    val body = "part1" + CRLF + CRLF + "part2" // blank line INSIDE the body
    val rec = "WARC/1.0" + CRLF +
      "warc-type: resource" + CRLF +
      "CONTENT-LENGTH: " + body.length + CRLF + CRLF +
      body + CRLF + CRLF
    val r = parse(1L -> rec)(1L)
    assert(r.getString(2) == "resource")
    assert(r.getLong(5) == body.length.toLong)
    assert(r.getLong(7) == body.length.toLong, "bounded by declared length, not next separator")
    assert(r.getString(8) == md5hex(body))
    assert(r.getBoolean(9))
  }

  test("refusals: missing version / separator / type / length each invalidate, partial fields survive") {
    val noVersion = "WARC-Type: response" + CRLF +
      "Content-Length: 2" + CRLF + CRLF + "ab"
    val noSep = "WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      "Content-Length: 2" + CRLF // truncated before blank line
    val noType = "WARC/1.0" + CRLF + "Content-Length: 2" + CRLF + CRLF + "ab"
    val badLen = "WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      "Content-Length: lots" + CRLF + CRLF + "ab"
    val noLen = "WARC/1.0" + CRLF + "WARC-Type: response" + CRLF + CRLF + "ab"
    val got = parse(1L -> noVersion, 2L -> noSep, 3L -> noType,
      4L -> badLen, 5L -> noLen)
    got.values.foreach(r => assert(!r.getBoolean(9), r.toString))
    // partial fields still there for triage
    assert(got(1L).getString(2) == "response" && got(1L).getLong(5) == 2L)
    assert(got(1L).isNullAt(1), "version null")
    assert(got(2L).isNullAt(6), "no separator -> no header count")
    assert(got(2L).isNullAt(8), "no separator -> no body")
    assert(got(3L).isNullAt(2) && got(3L).getLong(5) == 2L)
    assert(got(4L).isNullAt(5) && got(4L).isNullAt(8),
      "unparseable length -> no declared body")
    assert(got(5L).isNullAt(5))
  }

  test("declared length past record end truncates to what is present; zero-length body hashes empty") {
    val over = "WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      "Content-Length: 9999" + CRLF + CRLF + "short"
    val zero = "WARC/1.0" + CRLF + "WARC-Type: metadata" + CRLF +
      "Content-Length: 0" + CRLF + CRLF + CRLF + CRLF
    val got = parse(1L -> over, 2L -> zero)
    assert(got(1L).getLong(7) == 5L && got(1L).getString(8) == md5hex("short"))
    assert(got(1L).getBoolean(9), "truncated body is still a valid parse")
    assert(got(2L).getLong(7) == 0L && got(2L).getString(8) == md5hex(""))
    assert(got(2L).getBoolean(9))
  }

  test("warcRecord builder round-trips through warcParse (write side ≡ read side)") {
    import spark.implicits._
    val rec = Seq((7L, "body text", "http://h/x"))
      .toDF("id", "body", "uri")
      .select(col("id"), Warc.warcRecord(lit("conversion"),
        col("id").cast("string"), lit("2026-02-02T00:00:00Z"),
        col("uri"), col("body")).as("rec"))
    val r = Warc.warcParse(rec, "id", "rec").collect().head
    assert(r.getString(1) == "1.0" && r.getString(2) == "conversion" &&
      r.getString(3) == "http://h/x" &&
      r.getString(4) == "<urn:uuid:7>" &&
      r.getLong(5) == 9L && r.getLong(7) == 9L && r.getBoolean(9),
      r.toString)
  }

  test("one stateless scan: no shuffle, no UDF, codegen projection") {
    import spark.implicits._
    val docs = Seq((1L, "WARC/1.0\r\n\r\n")).toDF("id", "rec")
    val plan = Warc.warcParse(docs, "id", "rec")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"),
      s"warcParse must be a pure projection:\n$plan")
  }
}
