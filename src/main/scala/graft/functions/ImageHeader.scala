package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real, dependency-free image container decoder over a `binary` column:
  * parses PNG IHDR, JPEG SOF frame headers, and GIF logical-screen
  * descriptors — pure public-format byte arithmetic (the container specs:
  * PNG RFC 2083 §3.1/§4.1.1, JPEG ITU-T T.81 §B.2.2, GIF89a §18) with no
  * image library, so it runs identically on every executor with nothing
  * to ship.
  *
  * Output struct: `(format, width, height, valid)`.
  *   - `format` — container detected by magic number alone: `png` (full
  *     8-byte signature), `jpeg` (SOI marker FFD8), `gif` (GIF87a/GIF89a),
  *     else `unknown`.
  *   - `width`/`height` — parsed dimensions, or −1 when the header is
  *     truncated/corrupt past its magic.
  *   - `valid` — true iff dimensions were actually parsed.
  *
  * JPEG requires a real marker scan (segments before the SOF frame header
  * are variable-length), so the kernel is a bounded loop in a static
  * method — compiled once, invoked from generated code, same pattern as
  * [[BoundaryBucket]]. Never throws: arbitrary bytes (including
  * adversarially truncated payloads) yield `valid = false`, which is what
  * lets it run unguarded over a 100 TB crawl column.
  *
  * The reference cannot represent binary at all (SURVEY §1.2 — its data
  * model is JSON-encodable types only, yamr worker.py payloads are
  * strings); this is the §2.14 multimodal mandate's decode step made
  * real rather than stubbed.
  */
case class ImageHeader(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageHeader.schema
  override def prettyName: String = "image_header"

  override def nullSafeEval(input: Any): Any =
    ImageHeader.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageHeader.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ImageHeader =
    copy(child = newChild)
}

object ImageHeader {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("valid", BooleanType, nullable = false)))

  private def row(fmt: String, w: Int, h: Int, ok: Boolean): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h, ok))

  private def u16be(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  private def u16le(b: Array[Byte], p: Int): Int =
    ((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)

  private def u32be(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private val PNG_SIG =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def hasPngSig(b: Array[Byte]): Boolean =
    b.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(b, 0, 8), PNG_SIG)

  private def hasGifSig(b: Array[Byte]): Boolean =
    b.length >= 6 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** SOF markers that carry frame dimensions: C0–CF minus DHT (C4),
    * JPG (C8) and DAC (CC) — baseline, extended, progressive, lossless,
    * and their arithmetic/differential variants all share the
    * `len(2) precision(1) height(2) width(2)` payload prefix. */
  private def isSof(marker: Int): Boolean =
    marker >= 0xc0 && marker <= 0xcf &&
      marker != 0xc4 && marker != 0xc8 && marker != 0xcc

  /** Parse the container header of `b`. Total work is O(#segments) for
    * JPEG and O(1) for PNG/GIF; never throws. */
  def compute(b: Array[Byte]): InternalRow = {
    if (hasPngSig(b)) {
      // PNG: the IHDR chunk is REQUIRED to be first (RFC 2083 §4.1.1):
      // sig(8) len(4)=13 type(4)="IHDR" width(4 BE) height(4 BE) ...
      if (b.length >= 24 && u32be(b, 8) == 13L &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = u32be(b, 16)
        val h = u32be(b, 20)
        // PNG dims are 31-bit positive (spec caps at 2^31−1)
        if (w >= 1 && w <= Int.MaxValue && h >= 1 && h <= Int.MaxValue)
          row("png", w.toInt, h.toInt, ok = true)
        else row("png", -1, -1, ok = false)
      } else row("png", -1, -1, ok = false)
    } else if (hasGifSig(b)) {
      // GIF: logical screen descriptor immediately follows the 6-byte
      // version block — width u16 LE at 6, height u16 LE at 8
      if (b.length >= 10) row("gif", u16le(b, 6), u16le(b, 8), ok = true)
      else row("gif", -1, -1, ok = false)
    } else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: walk marker segments from after SOI until a SOF frame
      // header (ITU-T T.81 §B.2.2: len(2) precision(1) height(2)
      // width(2) ...) or the stream ends/desyncs
      var p = 2
      while (p + 1 < b.length) {
        if ((b(p) & 0xff) != 0xff) return row("jpeg", -1, -1, ok = false)
        val marker = b(p + 1) & 0xff
        if (marker == 0xff) {
          p += 1 // fill byte (§B.1.1.2): markers may be padded with FFs
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          p += 2 // standalone markers (TEM, RSTn) carry no length
        } else if (marker == 0xd9 || marker == 0xda) {
          // EOI / start-of-scan before any SOF: no dimensions to find
          // (entropy-coded data after SOS is not marker-structured)
          return row("jpeg", -1, -1, ok = false)
        } else {
          if (p + 3 >= b.length) return row("jpeg", -1, -1, ok = false)
          val len = u16be(b, p + 2)
          if (len < 2) return row("jpeg", -1, -1, ok = false)
          if (isSof(marker)) {
            if (len >= 7 && p + 8 < b.length)
              return row("jpeg", u16be(b, p + 7), u16be(b, p + 5), ok = true)
            return row("jpeg", -1, -1, ok = false)
          }
          p += 2 + len
        }
      }
      row("jpeg", -1, -1, ok = false)
    } else row("unknown", -1, -1, ok = false)
  }

  def apply(c: Column): Column = columnOf(new ImageHeader(expressionOf(c)))

  /** The same parse as a plain Scala call for per-partition (Dataset)
    * consumers: (format, width, height, valid). */
  def parse(b: Array[Byte]): (String, Int, Int, Boolean) = {
    val r = compute(b)
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getBoolean(3))
  }
}
