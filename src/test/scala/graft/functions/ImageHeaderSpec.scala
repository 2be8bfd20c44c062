package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Spec-truth fixtures for the image header decoder: byte sequences
  * hand-written from the PUBLIC container specs (PNG RFC 2083, JPEG
  * ITU-T T.81 §B, GIF89a), NOT produced by the engine's own corpus
  * builder — so a matched encode/decode bug (both sides agreeing on the
  * wrong offset or endianness) cannot pass here even though it would
  * survive q108's construction⊗parse round trip.
  */
class ImageHeaderSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def png(w: Int, h: Int): Array[Byte] =
    bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0x00, 0x00, 0x00, 0x0d, // IHDR length = 13
      'I', 'H', 'D', 'R',
      (w >> 24) & 0xff, (w >> 16) & 0xff, (w >> 8) & 0xff, w & 0xff,
      (h >> 24) & 0xff, (h >> 16) & 0xff, (h >> 8) & 0xff, h & 0xff,
      0x08, 0x02, 0x00, 0x00, 0x00, // depth, color, comp, filter, interlace
      0xde, 0xad, 0xbe, 0xef) // CRC (unchecked)

  test("PNG IHDR: width/height at bytes 16-23 big-endian") {
    assert(ImageHeader.parse(png(260, 3)) === (("png", 260, 3, true)))
    assert(ImageHeader.parse(png(1, 1)) === (("png", 1, 1, true)))
    assert(ImageHeader.parse(png(65537, 70000)) === (("png", 65537, 70000, true)))
  }

  test("PNG: truncated or non-IHDR-first is format png but invalid") {
    assert(ImageHeader.parse(png(9, 9).take(23)) === (("png", -1, -1, false)))
    val notIhdr = png(9, 9); notIhdr(12) = 'X'.toByte
    assert(ImageHeader.parse(notIhdr) === (("png", -1, -1, false)))
    // zero width violates the spec's 1..2^31-1 range
    assert(ImageHeader.parse(png(0, 5)) === (("png", -1, -1, false)))
  }

  test("JPEG: SOF0 after APP0, height at SOF+5, width at SOF+7 big-endian") {
    val jfif = bytes(0xff, 0xd8, // SOI
      0xff, 0xe0, 0x00, 0x10, // APP0, len 16
      'J', 'F', 'I', 'F', 0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xff, 0xc0, 0x00, 0x11, 0x08, // SOF0, len 17, precision 8
      0x00, 0x02, // height 2
      0x01, 0x04, // width 260
      0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01,
      0xff, 0xd9) // EOI
    assert(ImageHeader.parse(jfif) === (("jpeg", 260, 2, true)))
  }

  test("JPEG: progressive SOF2, fill bytes, and RST standalone markers") {
    val prog = bytes(0xff, 0xd8,
      0xff, 0xff, // fill byte padding before a marker (§B.1.1.2)
      0xff, 0x01, // TEM standalone
      0xff, 0xd0, // RST0 standalone
      0xff, 0xc2, 0x00, 0x0b, 0x08, // SOF2 (progressive), len 11
      0x12, 0x34, // height 0x1234
      0x00, 0x07, // width 7
      0x01, 0x01, 0x11, 0x00)
    assert(ImageHeader.parse(prog) === (("jpeg", 7, 0x1234, true)))
  }

  test("JPEG: DHT (C4) is NOT a frame header; EOI/SOS before SOF is invalid") {
    val dhtThenSof = bytes(0xff, 0xd8,
      0xff, 0xc4, 0x00, 0x04, 0xaa, 0xbb, // DHT, len 4 — must be skipped
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x05, 0x00, 0x06, 0x01, 0x01, 0x11, 0x00)
    assert(ImageHeader.parse(dhtThenSof) === (("jpeg", 6, 5, true)))
    assert(ImageHeader.parse(bytes(0xff, 0xd8, 0xff, 0xd9)) === (("jpeg", -1, -1, false)))
    assert(ImageHeader.parse(bytes(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0x00, 0x00))
      === (("jpeg", -1, -1, false)))
    // desync: a non-FF byte where a marker must start
    assert(ImageHeader.parse(bytes(0xff, 0xd8, 0x00, 0xc0)) === (("jpeg", -1, -1, false)))
    // segment length < 2 is malformed
    assert(ImageHeader.parse(bytes(0xff, 0xd8, 0xff, 0xfe, 0x00, 0x01))
      === (("jpeg", -1, -1, false)))
  }

  test("GIF: 87a and 89a logical screen descriptor, u16 little-endian") {
    val gif89 = "GIF89a".getBytes("US-ASCII") ++
      bytes(0x04, 0x01, /* w = 0x0104 = 260 */ 0x05, 0x00, /* h = 5 */
        0xf7, 0x00, 0x00)
    assert(ImageHeader.parse(gif89) === (("gif", 260, 5, true)))
    val gif87 = "GIF87a".getBytes("US-ASCII") ++ bytes(0x07, 0x00, 0x03, 0x00)
    assert(ImageHeader.parse(gif87) === (("gif", 7, 3, true)))
    assert(ImageHeader.parse("GIF89a".getBytes("US-ASCII") ++ bytes(0x01))
      === (("gif", -1, -1, false)))
    // GIF88a is not a real version token
    assert(ImageHeader.parse("GIF88a1234".getBytes("US-ASCII"))
      === (("unknown", -1, -1, false)))
  }

  test("unknown magics and degenerate inputs never throw") {
    assert(ImageHeader.parse(Array.emptyByteArray) === (("unknown", -1, -1, false)))
    assert(ImageHeader.parse(bytes(0x00)) === (("unknown", -1, -1, false)))
    assert(ImageHeader.parse("hello world".getBytes("UTF-8"))
      === (("unknown", -1, -1, false)))
    // lone SOI byte pair truncated mid-magic
    assert(ImageHeader.parse(bytes(0xff)) === (("unknown", -1, -1, false)))
    assert(ImageHeader.parse(bytes(0xff, 0xd8)) === (("jpeg", -1, -1, false)))
  }

  test("never throws on arbitrary bytes (pseudo-random sweep)") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      // bias some inputs toward magic prefixes so the parser bodies run
      if (b.length >= 2 && rnd.nextBoolean()) { b(0) = 0xff.toByte; b(1) = 0xd8.toByte }
      val (_, _, _, _) = ImageHeader.parse(b) // must not throw
    }
  }
}

/** The expression path through a real plan: codegen'd projection over a
  * binary column must agree with the interpreted kernel. (SQL-surface
  * registration is covered in GraftExtensionsSpec.) */
class ImageHeaderColumnSpec extends SparkSpec {
  test("image_header over a DataFrame binary column (codegen path)") {
    import spark.implicits._
    val png = Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt,
      0x00, 0x00, 0x00, 0x09, 0x00, 0x00, 0x00, 0x04,
      0x08, 0x06, 0x00, 0x00, 0x00, 0, 0, 0, 0).map(_.toByte).toArray
    val df = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("id", "payload")
    val viaColumn = df.select(col("id"), ImageHeader(col("payload")).as("h"))
      .select(col("id"), col("h.format"), col("h.width"), col("h.height"), col("h.valid"))
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))
    assert(viaColumn === Array((1L, "png", 9, 4, true), (2L, "unknown", -1, -1, false)))
  }
}
