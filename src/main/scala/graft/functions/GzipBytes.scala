package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Gzip compress/decompress as native codegen'd expressions over
  * BINARY columns — the in-plan halves of the engine's gzip story
  * (the FILE halves live in [[graft.sources.WarcSource]]: member
  * framing on read, the member sink on write; both share
  * [[GzipMember]] so the RFC 1952 header walk has ONE home).
  *
  * Why expressions and not UDFs: `Content-Encoding: gzip` is routine
  * on the real web, so payload decompression sits on the ingest hot
  * path (every crawled page), exactly like [[NfcNormalize]] on the
  * dedup path — a Scala UDF would add a serde boundary per row. Why
  * not built-ins: Spark has no gzip scalar (only codec-level file
  * compression).
  *
  * [[GunzipBytes]] is REFUSAL-grade (the crawl convention): a payload
  * that is not a well-formed gzip stream — wrong magic, truncated
  * deflate data, corrupt trailer, trailing garbage — returns NULL,
  * never a half-decompressed prefix; and a stream whose DECOMPRESSED
  * size exceeds [[GunzipBytes.MaxOut]] (256 MiB — generous for a
  * page, tiny next to executor memory) ALSO refuses: a gzip bomb is
  * malformed input by policy, and must NULL, not OOM (the [[
  * graft.operators.Http]] dechunk expression bounds chunk sizes for
  * the same reason). Multi-member streams concatenate (RFC 1952 §2.2
  * — a compliant decompressor treats members as one stream).
  * [[GzipBytes]] writes ONE member with a fixed header (mtime 0, no
  * flags: byte-deterministic for a given JVM zlib, and nothing
  * downstream ever pins compressed bytes — only round-trips).
  */
case class GzipBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_bytes"
  override def nullSafeEval(input: Any): Any =
    GzipBytes.compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipBytes.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): GzipBytes =
    copy(child = newChild)
}

object GzipBytes {
  def compute(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 32)
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b)
    g.close()
    bos.toByteArray
  }

  def apply(c: Column): Column = columnOf(new GzipBytes(expressionOf(c)))
}

case class GunzipBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gunzip_bytes"
  override def nullSafeEval(input: Any): Any =
    GunzipBytes.compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // compute may return null (refusal) — the default defineCodeGen
    // assumes non-null results, so set isNull from the call
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GunzipBytes.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): GunzipBytes =
    copy(child = newChild)
}

object GunzipBytes {

  /** Decompressed-size refusal bound (gzip-bomb guard; see scaladoc). */
  val MaxOut: Int = 256 * 1024 * 1024

  /** Strict multi-member gunzip; null on ANY malformation (including
    * exceeding [[MaxOut]]). Hot-path discipline: the empty check runs
    * before any allocation, the inflate buffer and Inflater are
    * per-thread reusables (one page decode must not cost three fresh
    * allocations at crawl scale). */
  def compute(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length == 0) return null
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(b.length * 3, 64), MaxOut))
    var p = 0
    val buf = GzipMember.threadBuf.get()
    val inf = GzipMember.threadInflater.get()
    while (p < b.length) {
      val q = GzipMember.skipHeader(b, p)
      if (q < 0) return null
      val crc = new java.util.zip.CRC32
      val memberStart = out.size()
      inf.reset()
      inf.setInput(b, q, b.length - q)
      try {
        var n = 1
        while (!inf.finished && n != 0) {
          n = inf.inflate(buf)
          if (n > 0) {
            if (out.size() + n > MaxOut) return null // bomb refusal
            out.write(buf, 0, n)
            crc.update(buf, 0, n)
          }
        }
        if (!inf.finished) return null // truncated deflate data
        val consumed = (b.length - q) - inf.getRemaining
        val t = q + consumed
        if (t + 8 > b.length) return null // truncated trailer
        if (GzipMember.readIntLE(b, t) != crc.getValue) return null
        if (GzipMember.readIntLE(b, t + 4) !=
          ((out.size() - memberStart).toLong & 0xFFFFFFFFL)) return null
        p = t + 8
      } catch {
        case _: java.util.zip.DataFormatException => return null
      }
    }
    out.toByteArray
  }

  def apply(c: Column): Column = columnOf(new GunzipBytes(expressionOf(c)))
}

/** `Content-Encoding: deflate` compress half (RFC 9110 §8.4.1.1 names
  * the coding "deflate" but means the RFC 1950 ZLIB wrapper): one
  * zlib stream, default level — byte-deterministic for a given JVM
  * zlib, and nothing downstream pins compressed bytes, only
  * round-trips (the [[GzipBytes]] convention). */
case class DeflateBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "deflate_bytes"
  override def nullSafeEval(input: Any): Any =
    DeflateBytes.compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateBytes.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateBytes =
    copy(child = newChild)
}

object DeflateBytes {
  def compute(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater() // zlib-wrapped, default level
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream(b.length / 2 + 32)
      val buf = new Array[Byte](8 * 1024)
      while (!d.finished) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }

  def apply(c: Column): Column = columnOf(new DeflateBytes(expressionOf(c)))
}

/** `Content-Encoding: deflate` decode half — REFUSAL-grade like
  * [[GunzipBytes]] (NULL on malformation or a decompressed size past
  * [[GunzipBytes.MaxOut]], never a half body), with the browser
  * tolerance the real web forces (VERDICT r16 next #4): the RFC says
  * zlib-wrapped, but a long tail of servers sends RAW deflate — so
  * the zlib attempt runs first (adler32 verified by the JDK
  * inflater), and on ANY zlib failure the stream is retried raw.
  * Attempt-then-fallback rather than header sniffing: a raw stream
  * whose first bytes happen to look like a zlib header (~0.2% of
  * streams under the CMF/FLG checksum rule) would misroute a sniffer,
  * while a raw stream that inflates COMPLETELY as zlib with a valid
  * adler32 is not a thing. Both attempts demand full consumption —
  * trailing garbage refuses. */
case class InflateBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "inflate_bytes"
  override def nullSafeEval(input: Any): Any =
    InflateBytes.compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.InflateBytes.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): InflateBytes =
    copy(child = newChild)
}

object InflateBytes {

  def compute(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length == 0) return null
    val zlib = inflateOnce(b, GzipMember.threadInflaterZlib.get())
    if (zlib != null) zlib
    else inflateOnce(b, GzipMember.threadInflater.get())
  }

  /** One strict inflate attempt with the given (reusable) inflater:
    * null on format error, truncation, bomb, or trailing bytes. */
  private def inflateOnce(b: Array[Byte],
      inf: java.util.zip.Inflater): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(b.length * 3, 64), GunzipBytes.MaxOut))
    val buf = GzipMember.threadBuf.get()
    inf.reset()
    inf.setInput(b)
    try {
      while (!inf.finished) {
        val n = inf.inflate(buf)
        if (n > 0) {
          if (out.size() + n > GunzipBytes.MaxOut) return null // bomb
          out.write(buf, 0, n)
        } else if (!inf.finished) return null // truncated / needs dict
      }
      if (inf.getRemaining != 0) return null // trailing garbage
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => null
    }
  }

  def apply(c: Column): Column = columnOf(new InflateBytes(expressionOf(c)))
}

/** The shared RFC 1952 member mechanics — ONE home for the header walk
  * and trailer arithmetic ([[GunzipBytes]] strict-refuses on error;
  * [[graft.sources.WarcSource.gunzipMembers]] keeps the prefix — the
  * two POLICIES share this one parser). */
private[graft] object GzipMember {

  val threadBuf: ThreadLocal[Array[Byte]] = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  /** Raw-deflate Inflater per thread, reset per use (native zlib state
    * is expensive to allocate per row; one lives per executor thread). */
  val threadInflater: ThreadLocal[java.util.zip.Inflater] =
    new ThreadLocal[java.util.zip.Inflater] {
      override def initialValue(): java.util.zip.Inflater =
        new java.util.zip.Inflater(true)
    }

  /** ZLIB-wrapped (RFC 1950) Inflater per thread — the first attempt
    * of [[InflateBytes]] (adler32 verified by the JDK). */
  val threadInflaterZlib: ThreadLocal[java.util.zip.Inflater] =
    new ThreadLocal[java.util.zip.Inflater] {
      override def initialValue(): java.util.zip.Inflater =
        new java.util.zip.Inflater(false)
    }

  /** Walk one member header starting at `p`: returns the offset of the
    * deflate data, or -1 when the header is malformed/truncated
    * (wrong magic, non-deflate CM, FLG fields running past the end). */
  def skipHeader(b: Array[Byte], p: Int): Int = skipHeader(b, p, b.length)

  /** Bound-aware form for callers holding a partially-filled buffer
    * (the r18 streaming member walk): `len` is the number of VALID
    * bytes in `b` — a -1 may then mean "truncated within the window",
    * which a streaming caller resolves by growing the window. */
  def skipHeader(b: Array[Byte], p: Int, len: Int): Int = {
    if (p + 10 > len || (b(p) & 0xFF) != 0x1F ||
      (b(p + 1) & 0xFF) != 0x8B || b(p + 2) != 8) return -1
    val flg = b(p + 3) & 0xFF
    var q = p + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (q + 2 > len) return -1
      val xlen = (b(q) & 0xFF) | ((b(q + 1) & 0xFF) << 8)
      q += 2 + xlen
    }
    if ((flg & 8) != 0) { while (q < len && b(q) != 0) q += 1; q += 1 }
    if ((flg & 16) != 0) { while (q < len && b(q) != 0) q += 1; q += 1 }
    if ((flg & 2) != 0) q += 2 // FHCRC
    if (q > len) -1 else q
  }

  def readIntLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
}
