package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

/** Law parity for the r18 streaming framer: for every framing input —
  * including every adversarial shape WarcSourceSpec pins on the batch
  * splitter — `WarcStreamFramer(stream)` must produce byte-identical
  * records to `splitRecordBytes(bytes)`, and `GzipMemberStream` must
  * yield `gunzipMembers(bytes)` exactly, at chunk sizes SMALLER than
  * every record so each pattern straddles refill boundaries. */
class WarcStreamSpec extends SparkSpec {

  private def rec(body: String, id: String): Array[Byte] =
    ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
      s"Content-Length: ${body.getBytes(UTF_8).length}\r\n\r\n" +
      body + "\r\n\r\n").getBytes(UTF_8)

  private def gzMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private def framed(b: Array[Byte], chunk: Int): Seq[Array[Byte]] =
    new WarcStreamFramer(new ByteArrayInputStream(b), chunk).toSeq

  private def assertParity(b: Array[Byte], chunk: Int, hint: String): Unit = {
    val want = WarcSource.splitRecordBytes(b).map(_.toSeq)
    val got = framed(b, chunk).map(_.toSeq)
    assert(got == want,
      s"$hint chunk=$chunk: got ${got.size} records, want ${want.size}" +
        got.zipAll(want, Seq.empty, Seq.empty).zipWithIndex
          .collect { case ((g, w), i) if g != w =>
            s"\n rec $i differs: got ${g.size}B want ${w.size}B" }
          .mkString)
  }

  test("framer == batch splitter on every adversarial fixture, tiny chunks") {
    val decoy = "see WARC/1.0\r\nWARC-Type: fake\r\n\r\ninside a page about warc"
    val noise = "\n\n--not warc--\n".getBytes(UTF_8)
    val truncated = "WARC/1.0\r\nWARC-Type: resp".getBytes(UTF_8)
    val overrun =
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999\r\n\r\nshort"
        .getBytes(UTF_8)
    val fixtures: Seq[(String, Array[Byte])] = Seq(
      "magic-in-body" -> (rec(decoy, "1") ++ rec("plain", "2")),
      "noise+truncated+overrun" -> (noise ++ rec("a", "1") ++ noise ++
        truncated ++ rec("bb", "2") ++ overrun),
      "empty" -> Array.empty[Byte],
      "magic-free" -> "no records here at all".getBytes(UTF_8),
      "bare-magic" -> "WARC/1.0\r\n".getBytes(UTF_8),
      "binary-body" -> {
        val bin = Array[Byte](0x00, -1, -2, 'W', 'A', 'R', 'C')
        (s"WARC/1.0\r\nContent-Length: ${bin.length}\r\n\r\n").getBytes(UTF_8) ++
          bin ++ "\r\n\r\n".getBytes(UTF_8) ++ rec("tail", "9")
      },
      "no-cl-header" ->
        ("WARC/1.0\r\nWARC-Type: x\r\n\r\nbody no length\r\n\r\n".getBytes(UTF_8)
          ++ rec("after", "3")),
      "sep-before-magic-at-boundary" ->
        (rec("ab", "1") ++ "WARC/1.0\r\n\r\n\r\nleft".getBytes(UTF_8))
    )
    for ((hint, b) <- fixtures; chunk <- Seq(16, 17, 23, 64, 1 << 20))
      assertParity(b, chunk, hint)
  }

  test("framer == batch splitter on random soups (property sweep)") {
    val rnd = new scala.util.Random(4218)
    val frags = Seq(
      "WARC/1.0\r\n", "\r\n\r\n", "Content-Length: ", "WARC/1.0",
      "Content-Length: 5\r\n\r\nhello\r\n\r\n", "\r\n", "x", "WARC",
      "Content-Length: 999\r\n\r\n", "junk ", "0", "WAR")
    (1 to 300).foreach { i =>
      val n = rnd.nextInt(12)
      val b = (1 to n).map(_ => frags(rnd.nextInt(frags.size))).mkString
        .getBytes(UTF_8)
      assertParity(b, 16 + rnd.nextInt(48), s"soup-$i")
    }
  }

  test("GzipMemberStream == gunzipMembers on clean/sloppy/corrupt members") {
    val r1 = rec("a", "1")
    val r2 = rec("bb", "2")
    def drained(b: Array[Byte]): Seq[Byte] = {
      val in = new GzipMemberStream(new ByteArrayInputStream(b), 1024)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](37) // odd size: force partial reads
      var n = in.read(buf, 0, buf.length)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf, 0, buf.length) }
      in.close()
      out.toByteArray.toSeq
    }
    val cases = Seq(
      "two members" -> (gzMember(r1) ++ gzMember(r2)),
      "multi-record member" -> gzMember(r1 ++ r2),
      "truncated second member" -> (gzMember(r1) ++ gzMember(r2).dropRight(12)),
      "trailing garbage" -> (gzMember(r1) ++ "not gzip".getBytes(UTF_8)),
      "junk only" -> "junk".getBytes(UTF_8),
      "empty" -> Array.empty[Byte],
      "truncated header" -> gzMember(r1).take(5))
    for ((hint, b) <- cases)
      assert(drained(b) == WarcSource.gunzipMembers(b).toSeq, hint)
  }

  test("large file (>> chunk) streams record-exact and matches binaryFile") {
    // ~3 MB of records framed through a 4 KB chunk: thousands of
    // boundary refills; one record is itself bigger than the chunk
    val rnd = new scala.util.Random(77)
    val bodies = (0 until 400).map { i =>
      if (i == 200) ("B" * 20000) + i else s"body-$i-" + ("x" * rnd.nextInt(64))
    }
    val raw = bodies.zipWithIndex
      .map { case (b, i) => rec(b, i.toString) }
      .reduce(_ ++ _)
    assertParity(raw, 4096, "large-raw")
    // through the DataFrame readers: streaming == batch, raw and .gz
    val dir = java.nio.file.Files.createTempDirectory("warcstream")
    java.nio.file.Files.write(dir.resolve("a.warc"), raw)
    val gz = bodies.zipWithIndex
      .map { case (b, i) => gzMember(rec(b, i.toString)) }
      .reduce(_ ++ _)
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), gz)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Seq[Byte])] =
      df.collect().map(r => (new org.apache.hadoop.fs.Path(r.getString(0)).getName,
        r.getLong(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    val batch = rows(WarcSource.readWarcRecordsBinary(spark, dir.toString))
    val stream = rows(WarcStream.readWarcRecordsBinaryStreaming(
      spark, dir.toString, chunk = 4096))
    assert(stream == batch, s"stream ${stream.size} vs batch ${batch.size}")
    assert(batch.size == 800)
  }
}
