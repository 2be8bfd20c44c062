package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Direct vectors for the single-pass [[DechunkBody]] expression.
  * The HTTP-level laws (final-coding dispatch, Content-Length
  * interaction, the q204 oracle) live in HttpSpec — these pin the
  * walk itself, including the cases that distinguished the replaced
  * aggregate-fold implementation's edges. */
class DechunkBodySpec extends SparkSpec {

  private val CRLF = "\r\n"

  private def run(s: String): Option[String] =
    Option(DechunkBody.compute(UTF8String.fromString(s))).map(_.toString)

  test("happy path: multi-chunk, hex sizes, extension, BWS, zero padding, trailer ignored") {
    val body = "4" + CRLF + "abcd" + CRLF +
      "A;ext=1" + CRLF + "0123456789" + CRLF +
      "00000003 \t" + CRLF + "xyz" + CRLF +
      "0" + CRLF + "Trailer: v" + CRLF + CRLF
    assert(run(body).contains("abcd0123456789xyz"))
    // terminal immediately
    assert(run("0" + CRLF).contains(""))
    // trailing garbage after the 0-chunk line is ignored
    assert(run("1" + CRLF + "x" + CRLF + "0" + CRLF + "garbage no crlf")
      .contains("x"))
  }

  test("chunk data containing CRLF + hex-looking lines must not re-split") {
    val data = "ab" + CRLF + "3" + CRLF + "cd"
    val body = Integer.toHexString(data.length) + CRLF + data + CRLF +
      "0" + CRLF
    assert(run(body).contains(data))
  }

  test("refusals: bad size line, no CRLF, truncated data, missing data CRLF, no 0-chunk, 8 hex digits") {
    assert(run("zz" + CRLF + "ab" + CRLF + "0" + CRLF).isEmpty)
    assert(run("4 no crlf anywhere").isEmpty)
    assert(run("5" + CRLF + "abc").isEmpty) // data shorter than size
    assert(run("3" + CRLF + "abcXX0" + CRLF).isEmpty) // no data CRLF
    assert(run("3" + CRLF + "abc" + CRLF).isEmpty) // stream ends, no 0
    assert(run("").isEmpty)
    // 8 SIGNIFICANT hex digits exceed the 7-digit value bound
    assert(run("10000000" + CRLF + "x" + CRLF + "0" + CRLF).isEmpty)
    // size line with ext but junk between size and ';'
    assert(run("3x;e" + CRLF + "abc" + CRLF + "0" + CRLF).isEmpty)
  }

  test("sizes count code points (the column-substr unit), not UTF-16 units or bytes") {
    // "é€" is 2 code points (3 UTF-8 bytes, 2 UTF-16 units); "🙂" is
    // 1 code point (4 bytes, 2 UTF-16 units) — a byte- or char-unit
    // walk would mis-jump and refuse or mis-slice
    val body = "2" + CRLF + "é€" + CRLF + "1" + CRLF + "🙂" + CRLF + "0" + CRLF
    assert(run(body).contains("é€🙂"))
  }

  test("column form matches eval form through codegen") {
    import spark.implicits._
    val body = "3" + CRLF + "foo" + CRLF + "3" + CRLF + "bar" + CRLF + "0" + CRLF
    val rows = Seq(body, "junk", null).toDF("b")
      .select(DechunkBody(col("b")).as("d")).collect()
    assert(rows(0).getString(0) == "foobar")
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
  }
}
