package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HTTP response-parse laws on hand-written messages (spec-truth, not
  * the q188 builder). */
class HttpSpec extends SparkSpec {

  private val CRLF = "\r\n"

  private def parse(msg: String) = {
    import spark.implicits._
    Http.httpParse(Seq((1L, msg)).toDF("id", "msg"), "id", "msg")
      .collect().head
  }

  test("well-formed 200: every field parses") {
    val r = parse("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/HTML; charset=UTF-8" + CRLF +
      "Content-Length: 5" + CRLF + CRLF + "hello trailing garbage")
    assert(r.getString(1) == "1.1" && r.getInt(2) == 200 &&
      r.getString(3) == "OK" && r.getString(4) == "text/html" &&
      r.getString(5) == "utf-8" && r.isNullAt(6) &&
      r.getLong(7) == 5L && r.getLong(8) == 2L && r.getLong(9) == 5L &&
      r.getBoolean(11), r.toString)
  }

  test("close-delimited body: no Content-Length takes the whole rest") {
    val r = parse("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/plain" + CRLF + CRLF + "abcdefgh")
    assert(r.isNullAt(7) && r.getLong(9) == 8L && r.getBoolean(11),
      r.toString)
  }

  test("declared length past the end truncates to what is present") {
    val r = parse("HTTP/1.1 200 OK" + CRLF +
      "Content-Length: 100" + CRLF + CRLF + "short")
    assert(r.getLong(7) == 100L && r.getLong(9) == 5L, r.toString)
  }

  test("refusals: junk prefix and missing separator are valid=false with partial fields") {
    val junk = parse("junk" + CRLF + "HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html" + CRLF + CRLF + "x")
    assert(!junk.getBoolean(11) && junk.isNullAt(1) && junk.isNullAt(2) &&
      junk.getString(4) == "text/html", junk.toString)
    val nosep = parse("HTTP/1.1 404 Not Found")
    assert(!nosep.getBoolean(11) && nosep.getInt(2) == 404 &&
      nosep.getString(3) == "Not Found" && nosep.isNullAt(9) &&
      nosep.isNullAt(10), nosep.toString)
  }

  test("redirect: Location and quoted charset; empty reason is NULL") {
    val r = parse("HTTP/1.0 301" + CRLF +
      "Location: http://a.example.com/x" + CRLF +
      "Content-Type: text/html; charset=\"ISO-8859-1\"" + CRLF + CRLF)
    assert(r.getString(1) == "1.0" && r.getInt(2) == 301 && r.isNullAt(3) &&
      r.getString(5) == "iso-8859-1" &&
      r.getString(6) == "http://a.example.com/x", r.toString)
  }

  test("httpPayloads gate: 200 + kept media type only, payload text emitted") {
    import spark.implicits._
    val msgs = Seq(
      (1L, "HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF +
        "Content-Length: 2" + CRLF + CRLF + "ok"),
      (2L, "HTTP/1.1 404 Not Found" + CRLF +
        "Content-Type: text/html" + CRLF + CRLF + "no"),
      (3L, "HTTP/1.1 200 OK" + CRLF + "Content-Type: image/png" + CRLF +
        CRLF + "no"),
      (4L, "garbage")).toDF("id", "msg")
    val got = Http.httpPayloads(msgs, "id", "msg").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toList
    assert(got == List((1L, "text/html", "ok")), got.toString)
  }
}
