package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset transcode of a latin-1 byte-transport string as ONE native
  * codegen expression (round 17), replacing the Column composition in
  * [[graft.operators.Http.transcode]] (`encode` → `is_valid_utf8` →
  * `cast`: several full passes and allocations per page, measured
  * 42.9 MB/s on the ingest hot path). One behavior CHANGE vs round 16
  * rides along, by design: the utf-8 arm now REFUSES input containing
  * code points above U+00FF (the ADVICE r16 mojibake finding — the
  * old encode silently '?'-substituted them, and the mangled bytes
  * could still pass the UTF-8 validity check); everything else is
  * byte-identical to the round-16 arms. This walks the payload once.
  *
  * Arms (the q205 contract, byte-for-byte):
  *   - utf-8 / utf8 / us-ascii / ascii: the transport chars ARE the
  *     original bytes — any code point above U+00FF refuses (not a
  *     byte transport; the ADVICE r16 mojibake guard), the recovered
  *     bytes must be valid UTF-8 ([[UTF8String.isValid]], the same
  *     check `is_valid_utf8` compiles to) or refuse;
  *   - iso-8859-1 / iso8859-1 / latin-1 / latin1: identity — the
  *     transport decode IS the text (returns the INPUT, zero copy);
  *   - windows-1252 / cp1252: latin-1 plus the 27-point 0x80–0x9F
  *     graphical block (same table as the `translate` it replaces;
  *     other chars — including any above U+00FF — pass through, the
  *     `translate` semantics);
  *   - anything else: NULL (unknown-charset refusal).
  * A NULL charset must default to utf-8 BEFORE this expression (the
  * [[graft.operators.Http.transcode]] wrapper coalesces), so both
  * children are null-intolerant here.
  */
case class TranscodeTransport(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "transcode_transport"

  override def nullSafeEval(payload: Any, charset: Any): Any =
    TranscodeTransport.compute(payload.asInstanceOf[UTF8String],
      charset.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, c) => s"""
      ${ev.value} = graft.functions.TranscodeTransport.compute($p, $c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TranscodeTransport =
    copy(left = newLeft, right = newRight)
}

object TranscodeTransport {

  // the 27 cp1252 0x80–0x9F graphical points, indexed by `byte - 0x80`
  // (the 5 undefined bytes — 0x81 0x8D 0x8F 0x90 0x9D — map to
  // themselves: they pass through as their C1 controls, matching the
  // JDK decoder and the translate table this expression replaced)
  private val Cp1252: Array[Char] = {
    val m = new Array[Char](32)
    for (i <- 0 until 32) m(i) = (0x80 + i).toChar
    val defined: Seq[(Int, Int)] = Seq(
      0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
      0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
      0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
      0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
      0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
      0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
      0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    defined.foreach { case (b, cp) => m(b - 0x80) = cp.toChar }
    m
  }

  def compute(payload: UTF8String, charset: UTF8String): UTF8String = {
    val cs = charset.toString.toLowerCase(java.util.Locale.ROOT)
    cs match {
      case "utf-8" | "utf8" | "us-ascii" | "ascii" => utf8Arm(payload)
      case "iso-8859-1" | "iso8859-1" | "latin-1" | "latin1" => payload
      case "windows-1252" | "cp1252" => cp1252Arm(payload)
      case _ => null
    }
  }

  /** Recover the transport bytes (one UTF-8 walk: ASCII byte, or a
    * C2/C3 lead + continuation = one latin-1 byte; anything else means
    * a code point above U+00FF → refuse) and reinterpret them as UTF-8
    * iff valid. The all-ASCII fast path returns the input object. */
  private def utf8Arm(p: UTF8String): UTF8String = {
    val n = p.numBytes
    if (n == p.numChars) {
      // pure ASCII: transport bytes == input bytes == already-valid
      // UTF-8 — zero copy (the NfcNormalize fast-path discipline)
      return p
    }
    val in = p.getBytes
    val out = new Array[Byte](n) // transport bytes ≤ UTF-8 bytes
    var i = 0
    var o = 0
    while (i < in.length) {
      val b = in(i) & 0xFF
      if (b < 0x80) { out(o) = b.toByte; o += 1; i += 1 }
      else if ((b == 0xC2 || b == 0xC3) && i + 1 < in.length &&
          (in(i + 1) & 0xC0) == 0x80) { // continuation byte required:
        // a malformed sequence must refuse like the old path (whose
        // toString turned it into U+FFFD, above U+00FF)
        out(o) = (((b & 0x1F) << 6) | (in(i + 1) & 0x3F)).toByte
        o += 1; i += 2
      } else return null // code point > U+00FF: not a byte transport
    }
    val u = UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
    if (u.isValid) u else null
  }

  /** One code-point walk applying the cp1252 0x80-block map; returns
    * the input object when nothing maps (the common page). */
  private def cp1252Arm(p: UTF8String): UTF8String = {
    val s = p.toString
    var i = 0
    var changed = false
    while (i < s.length && !changed) {
      val c = s.charAt(i)
      changed = c >= 0x80 && c <= 0x9F
      i += 1
    }
    if (!changed) return p
    val sb = new java.lang.StringBuilder(s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      sb.append(if (c >= 0x80 && c <= 0x9F) Cp1252(c - 0x80) else c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def apply(payload: Column, charset: Column): Column =
    columnOf(new TranscodeTransport(
      expressionOf(payload), expressionOf(charset)))
}
