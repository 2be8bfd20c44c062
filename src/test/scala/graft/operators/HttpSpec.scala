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
      r.isNullAt(7) && r.isNullAt(8) && // no validators in this message
      r.getLong(9) == 5L && r.getLong(10) == 2L && r.getLong(11) == 5L &&
      r.getBoolean(13), r.toString)
  }

  test("close-delimited body: no Content-Length takes the whole rest") {
    val r = parse("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/plain" + CRLF + CRLF + "abcdefgh")
    assert(r.isNullAt(9) && r.getLong(11) == 8L && r.getBoolean(13),
      r.toString)
  }

  test("declared length past the end truncates to what is present") {
    val r = parse("HTTP/1.1 200 OK" + CRLF +
      "Content-Length: 100" + CRLF + CRLF + "short")
    assert(r.getLong(9) == 100L && r.getLong(11) == 5L, r.toString)
  }

  test("refusals: junk prefix and missing separator are valid=false with partial fields") {
    val junk = parse("junk" + CRLF + "HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html" + CRLF + CRLF + "x")
    assert(!junk.getBoolean(13) && junk.isNullAt(1) && junk.isNullAt(2) &&
      junk.getString(4) == "text/html", junk.toString)
    val nosep = parse("HTTP/1.1 404 Not Found")
    assert(!nosep.getBoolean(13) && nosep.getInt(2) == 404 &&
      nosep.getString(3) == "Not Found" && nosep.isNullAt(11) &&
      nosep.isNullAt(12), nosep.toString)
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
      .map(r => (r.getLong(0), r.getString(1), r.getString(4))).toList
    assert(got == List((1L, "text/html", "ok")), got.toString)
  }

  test("httpPayloads Content-Encoding: gzip decompresses, identity passes, unknown and corrupt refuse") {
    import spark.implicits._
    def msg(payload: Array[Byte], ce: String): String =
      "HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF +
        (if (ce == null) "" else s"Content-Encoding: $ce" + CRLF) +
        CRLF + new String(payload, java.nio.charset.StandardCharsets.ISO_8859_1)
    val gz = graft.functions.GzipBytes.compute("hello gz".getBytes("UTF-8"))
    val msgs = Seq(
      (1L, msg(gz, "gzip")),
      (2L, msg("plain".getBytes("UTF-8"), null)),
      (3L, msg("same".getBytes("UTF-8"), "identity")),
      (4L, msg("mystery".getBytes("UTF-8"), "br")),
      (5L, msg(gz.dropRight(3), "gzip"))) // truncated stream
      .toDF("id", "msg")
    val got = Http.httpPayloads(msgs, "id", "msg").collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(3)), Option(r.getString(4))))).toMap
    assert(got(1L) == ((Some("gzip"), Some("hello gz"))), got(1L).toString)
    assert(got(2L) == ((None, Some("plain"))))
    assert(got(3L) == ((Some("identity"), Some("same"))))
    assert(got(4L) == ((Some("br"), None)), "unknown coding refuses")
    assert(got(5L) == ((Some("gzip"), None)), "corrupt stream refuses")
  }

  test("gzip_bytes/gunzip_bytes: round-trip, multi-member, strict refusals") {
    import spark.implicits._
    import graft.functions.{GzipBytes, GunzipBytes}
    val data = "αβγ some text μ".getBytes("UTF-8")
    val r = Seq(Tuple1(data)).toDF("b")
      .select(GunzipBytes(GzipBytes(col("b"))).as("rt"))
      .collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(r, data), "round-trip")
    // multi-member concatenation (RFC 1952 §2.2)
    val two = GzipBytes.compute("ab".getBytes("UTF-8")) ++
      GzipBytes.compute("cd".getBytes("UTF-8"))
    assert(new String(GunzipBytes.compute(two), "UTF-8") == "abcd")
    // refusals: junk, empty, bad CRC, trailing garbage
    assert(GunzipBytes.compute("junk".getBytes("UTF-8")) == null)
    assert(GunzipBytes.compute(Array.empty[Byte]) == null)
    val corrupt = GzipBytes.compute("xyz".getBytes("UTF-8"))
    corrupt(corrupt.length - 5) = (corrupt(corrupt.length - 5) ^ 0x7).toByte
    assert(GunzipBytes.compute(corrupt) == null, "CRC mismatch refuses")
    val trailing = GzipBytes.compute("ok".getBytes("UTF-8")) ++
      "garbage".getBytes("UTF-8")
    assert(GunzipBytes.compute(trailing) == null,
      "trailing non-member bytes refuse (strict, unlike the file reader)")
    // gzip bomb: a stream whose DECOMPRESSED size exceeds MaxOut must
    // refuse (never OOM) — 300 MiB of zeros compresses to ~300 KB
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      val zeros = new Array[Byte](1 << 20)
      (0 until 300).foreach(_ => g.write(zeros))
      g.close()
      bos.toByteArray
    }
    assert(GunzipBytes.compute(bomb) == null,
      s"gzip bomb (compressed ${bomb.length} B) must refuse, not OOM")
  }

  test("deflate_bytes/inflate_bytes: zlib round-trip, raw fallback, strict refusals") {
    import spark.implicits._
    import graft.functions.{DeflateBytes, InflateBytes}
    val data = "deflate coding αβγ text".getBytes("UTF-8")
    val r = Seq(Tuple1(data)).toDF("b")
      .select(InflateBytes(DeflateBytes(col("b"))).as("rt"))
      .collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(r, data), "zlib round-trip")
    // RAW deflate (the browser-tolerance path): strip the 2-byte zlib
    // header and 4-byte adler32 — must still inflate
    val zlib = DeflateBytes.compute(data)
    val raw = zlib.slice(2, zlib.length - 4)
    assert(java.util.Arrays.equals(InflateBytes.compute(raw), data),
      "raw deflate fallback")
    // refusals: junk, empty, truncation, adler corruption, trailing
    assert(InflateBytes.compute("!!garbage!!".getBytes("UTF-8")) == null)
    assert(InflateBytes.compute(Array.empty[Byte]) == null)
    assert(InflateBytes.compute(zlib.slice(0, 8)) == null, "truncated")
    val corrupt = zlib.clone()
    corrupt(corrupt.length - 2) = (corrupt(corrupt.length - 2) ^ 0x7).toByte
    assert(InflateBytes.compute(corrupt) == null, "adler mismatch refuses")
    assert(InflateBytes.compute(zlib ++ "x".getBytes("UTF-8")) == null,
      "trailing garbage refuses")
    // zlib bomb: decompressed size past MaxOut refuses, never OOMs
    val bomb = {
      val d = new java.util.zip.Deflater()
      val bos = new java.io.ByteArrayOutputStream()
      val zeros = new Array[Byte](1 << 20)
      (0 until 300).foreach { _ => d.setInput(zeros); while (!d.needsInput) {
        val buf = new Array[Byte](1 << 16); val n = d.deflate(buf)
        bos.write(buf, 0, n) } }
      d.finish()
      while (!d.finished) { val buf = new Array[Byte](1 << 16)
        val n = d.deflate(buf); bos.write(buf, 0, n) }
      d.end()
      bos.toByteArray
    }
    assert(InflateBytes.compute(bomb) == null,
      s"zlib bomb (compressed ${bomb.length} B) must refuse, not OOM")
  }

  test("httpPayloads Content-Encoding: deflate decodes zlib AND raw; truncated refuses") {
    import spark.implicits._
    import graft.functions.DeflateBytes
    def msg(body: String, ce: String) =
      "HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF +
        s"Content-Encoding: $ce" + CRLF +
        s"Content-Length: ${body.length}" + CRLF + CRLF + body
    val zlib = DeflateBytes.compute("<p>zz</p>".getBytes("UTF-8"))
    val zs = new String(zlib, "ISO-8859-1")
    val raws = new String(zlib.slice(2, zlib.length - 4), "ISO-8859-1")
    val df = Seq(
      (1L, msg(zs, "deflate")), (2L, msg(raws, "deflate")),
      (3L, msg(zs.substring(0, 5), "deflate")))
      .toDF("doc_id", "msg")
    val got = Http.httpPayloads(df, "doc_id", "msg")
      .orderBy("doc_id").collect()
    assert(got(0).getAs[String]("payload") == "<p>zz</p>")
    assert(got(1).getAs[String]("payload") == "<p>zz</p>")
    assert(got(2).getAs[String]("payload") == null)
    assert(got.forall(_.getAs[String]("content_encoding") == "deflate"))
  }

  test("Retry-After: delta-seconds, IMF-fixdate, junk refusal, 429/503-only, max-wins, gate") {
    import spark.implicits._
    def m(status: String, ra: String) =
      s"HTTP/1.1 $status" + CRLF + s"Retry-After: $ra" + CRLF + CRLF
    val fetches = Seq(
      ("a.org", 429, m("429 Too Many", "120")),
      ("a.org", 503, m("503 Unavailable", "Thu, 05 Feb 2026 02:00:00 GMT")),
      ("b.org", 503, m("503 Unavailable", "whenever")), // junk: refuses
      ("c.org", 200, m("200 OK", "99999")))             // 200: ignored
      .toDF("host", "status", "msg")
      .withColumn("fetch_ts", lit("2026-02-05 00:00:00").cast("timestamp"))
    val bo = Http.hostBackoff(fetches, "host", "status", "msg", "fetch_ts")
      .collect().map(r => r.getString(0) -> r.getTimestamp(1).toString).toMap
    // a.org: max(00:02:00 delta, 02:00:00 date) = the date
    assert(bo == Map("a.org" -> "2026-02-05 02:00:00.0"), bo.toString)
    val batch = Seq(("u1", "a.org"), ("u2", "b.org"), ("u3", "c.org"))
      .toDF("url", "host")
    val gated = Http.frontierBackoffGate(batch,
        Http.hostBackoff(fetches, "host", "status", "msg", "fetch_ts"),
        "host", asOf = "2026-02-05 01:00:00")
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("deferred"))
      .toMap
    assert(gated == Map("u1" -> true, "u2" -> false, "u3" -> false),
      gated.toString)
  }

  test("metaCharset: HTML5 and legacy http-equiv forms, prescan budget, absent -> NULL") {
    import spark.implicits._
    def sniff(html: String): Option[String] = {
      val r = Seq(Tuple1(html)).toDF("h")
        .select(Http.metaCharset(col("h")).as("cs")).collect().head
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
    assert(sniff("<html><head><meta charset=UTF-8></head>") contains "utf-8")
    assert(sniff("<meta charset=\"Windows-1252\">") contains "windows-1252")
    assert(sniff("<meta http-equiv='Content-Type' " +
      "content='text/html; charset=iso-8859-1'>") contains "iso-8859-1")
    assert(sniff("<html><body>no declaration</body></html>").isEmpty)
    // outside the 1024-char prescan budget: not sniffed (HTML5 rule)
    assert(sniff(("x" * 1100) + "<meta charset=utf-8>").isEmpty)
  }

  // ------------------------------------------------------- dechunk laws
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def chunkedMsg(body: String, te: String = "chunked"): String =
    "HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF +
      s"Transfer-Encoding: $te" + CRLF + CRLF + body

  test("dechunk: multi-chunk with extension + trailer reassembles; sizes are hex") {
    // 26 chars split 10 ('a'..'j') + 16; 10 = 0xa, 16 = 0x10
    val data = "abcdefghijklmnopqrstuvwxyz"
    val body = "a;ext=1" + CRLF + data.take(10) + CRLF +
      "10" + CRLF + data.drop(10) + CRLF +
      "0" + CRLF + "X-Trailer: ignored" + CRLF + CRLF
    val r = parse(chunkedMsg(body))
    assert(r.getLong(11) == 26L, r.toString)
    assert(r.getString(12) == md5hex(data))
    // chunk data CONTAINING a CRLF + hex-looking line must NOT re-split
    // (length-driven jump, never a scan): 7 declared chars of "x\r\n3\r\ny"
    val tricky = "7" + CRLF + "x\r\n3\r\ny" + CRLF + "0" + CRLF + CRLF
    val r2 = parse(chunkedMsg(tricky))
    assert(r2.getLong(11) == 7L && r2.getString(12) == md5hex("x\r\n3\r\ny"),
      r2.toString)
    // RFC-valid shapes that must NOT refuse (code-review r16):
    // fixed-width zero-padded sizes and BWS before the extension ';'
    val padded = "00000003" + CRLF + "abc" + CRLF +
      "2 ;ext=v" + CRLF + "de" + CRLF + "0000000" + CRLF + CRLF
    val r3 = parse(chunkedMsg(padded))
    assert(r3.getLong(11) == 5L && r3.getString(12) == md5hex("abcde"),
      r3.toString)
  }

  test("dechunk refusals: truncated data, bad size line, missing data CRLF → NULL payload") {
    val truncated = "ff" + CRLF + "only a few chars"
    val r1 = parse(chunkedMsg(truncated))
    assert(r1.isNullAt(11) && r1.isNullAt(12) && r1.getBoolean(13),
      "payload refused, message still valid: " + r1)
    val badSize = "zz" + CRLF + "abc" + CRLF + "0" + CRLF + CRLF
    assert(parse(chunkedMsg(badSize)).isNullAt(11))
    val noTerm = "3" + CRLF + "abcXX" + "0" + CRLF + CRLF
    assert(parse(chunkedMsg(noTerm)).isNullAt(11))
    val noFinal = "3" + CRLF + "abc" + CRLF // never reaches a 0-chunk
    assert(parse(chunkedMsg(noFinal)).isNullAt(11))
  }

  test("dechunk applies only when chunked is the FINAL coding; Content-Length ignored when it is") {
    val body = "3" + CRLF + "abc" + CRLF + "0" + CRLF + CRLF
    // "gzip, chunked": final coding chunked -> dechunk
    val r1 = parse(chunkedMsg(body, te = "gzip, chunked"))
    assert(r1.getLong(11) == 3L && r1.getString(12) == md5hex("abc"))
    // "chunked, gzip": final coding NOT chunked -> close-delimited raw
    val r2 = parse(chunkedMsg(body, te = "chunked, gzip"))
    assert(r2.getLong(11) == body.length.toLong)
    // chunked + a (wrong) Content-Length: TE wins (RFC 9112 §6.3 rule 3)
    val r3 = parse("HTTP/1.1 200 OK" + CRLF +
      "Content-Length: 2" + CRLF + "Transfer-Encoding: chunked" +
      CRLF + CRLF + body)
    assert(r3.getLong(11) == 3L, r3.toString)
  }

  // ----------------------------------------------------- transcode laws
  private def transcode(payload: String, cs: String): Option[String] = {
    import spark.implicits._
    val r = Seq((1L, payload, cs)).toDF("id", "p", "cs")
      .select(Http.transcode(col("p"),
        when(col("cs") === "", lit(null).cast("string"))
          .otherwise(col("cs"))).as("t"))
      .collect().head
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("transcode: utf-8 byte-transport decodes; invalid utf-8 refuses") {
    // 'é' as UTF-8 bytes 0xC3 0xA9 viewed as latin-1 chars
    assert(transcode("caf\u00C3\u00A9", "utf-8").contains("caf\u00E9"))
    assert(transcode("ok", "").contains("ok"), "absent charset defaults utf-8")
    assert(transcode("bad \u00FF\u00FE", "utf-8").isEmpty,
      "invalid UTF-8 refuses, never mojibake")
  }

  test("transcode: iso-8859-1 is identity; cp1252 maps the 0x80 block; unknown refuses") {
    assert(transcode("na\u00EFve", "iso-8859-1").contains("na\u00EFve"))
    // bytes 0x80 -> \u20AC, 0x93 -> \u201C, 0x99 -> \u2122; 0xE9 stays
    // latin-1; undefined 0x8D passes through as its C1 control
    assert(transcode("\u0080\u0093\u0099\u008D\u00E9", "WINDOWS-1252")
      .contains("\u20AC\u201C\u2122\u008D\u00E9"))
    assert(transcode("anything", "shift_jis").isEmpty, "unknown charset refuses")
  }

  test("transcode domain guard: chars above U+00FF refuse the utf-8 arm, pass through cp1252/8859-1") {
    // a real-text (non-transport) input reaching the utf-8 arm must
    // NULL, never '?'-mangle (ADVICE r16); the other arms keep their
    // translate/identity semantics for such chars
    assert(transcode("real text €", "utf-8").isEmpty)
    assert(transcode("x€y", "iso-8859-1").contains("x€y"))
    assert(transcode("x€y", "cp1252").contains("x€y"))
    // charset names case-fold; NULL charset defaults to utf-8
    import spark.implicits._
    val r = Seq(Tuple1("cafÃ©")).toDF("p")
      .select(Http.transcode(org.apache.spark.sql.functions.col("p"),
        org.apache.spark.sql.functions.lit(null).cast("string")).as("t"))
      .collect().head
    assert(r.getString(0) == "café", "NULL charset = utf-8 transport decode")
  }
}
