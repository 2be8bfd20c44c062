package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTTP/1.1 `Transfer-Encoding: chunked` body decoding (RFC 9112 §7.1)
  * as a native codegen'd expression — ONE imperative walk over the
  * body, replacing the earlier higher-order `aggregate` fold whose
  * step re-sliced the remaining body per chunk (O(chunks × body) time,
  * plus a CRLF-count-sized step array per row; VERDICT r16 next #2 /
  * ADVICE r16). This expression is O(body) time, O(output) space, and
  * sits on the declared ingest hot path (every chunked crawl response)
  * exactly like [[GunzipBytes]].
  *
  * Grammar walked: `*( chunk-size [chunk-ext] CRLF chunk-data CRLF )
  * 0 [ext] CRLF trailer…` — chunk extensions are skipped, everything
  * after the 0-size chunk (trailer section) is ignored. The size line
  * must match `^0*([0-9A-Fa-f]{1,7})[ \t]*(;[^\r\n]*)?$` — leading
  * zeros stripped, then at most 7 significant hex digits (a 268 MB
  * chunk VALUE bound), optional BWS before the `;` extension — the
  * EXACT pattern (and Java-regex `find()` anchor quirks) of the fold
  * it replaces, so the q204/q188/q93d oracles pin unchanged behavior.
  *
  * Refusal semantics (never-throws, never a half body — the
  * [[GunzipBytes]] convention): NULL on a non-matching size line, a
  * size line with no CRLF, chunk data shorter than its declared size,
  * a missing CRLF after chunk data, a stream that ends before the
  * 0-chunk, or an accumulated output exceeding [[DechunkBody.MaxOut]]
  * (the chunk-bomb guard ADVICE r16 asked for: a stream declaring
  * endless 268 MB chunks must refuse, not OOM).
  *
  * Unit discipline: sizes count CODE POINTS of the string column —
  * identical to the `substr`/`length` semantics of the fold this
  * replaces. Under the [[graft.operators.Warc]] latin-1 byte
  * transport (the production path) code points ARE the original
  * bytes, so chunk sizes count bytes exactly as the RFC intends.
  */
case class DechunkBody(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "dechunk_body"

  override def nullSafeEval(input: Any): Any =
    DechunkBody.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.DechunkBody.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): DechunkBody =
    copy(child = newChild)
}

object DechunkBody {

  /** Accumulated-output refusal bound in UTF-16 units (chunk-bomb
    * guard; aligned with [[GunzipBytes.MaxOut]] — generous for any
    * real page, tiny next to executor memory). ADVICE r17: the check
    * below counts `out.length()` UTF-16 units, so for non-transport
    * inputs containing astral characters the effective code-point
    * bound halves — irrelevant on the latin-1 byte-transport
    * production path, where units, code points and bytes coincide,
    * and conservative (refuses earlier, never later) everywhere else. */
  val MaxOut: Int = 256 * 1024 * 1024

  // the size-line pattern of the fold this expression replaced —
  // matched with find() to mirror regexp_extract's first-match (and
  // $-before-final-newline) semantics byte for byte
  private val SizeLine: Pattern =
    Pattern.compile("^0*([0-9A-Fa-f]{1,7})[ \\t]*(;[^\\r\\n]*)?$")

  /** Single-pass de-chunk; null on ANY malformation (see scaladoc). */
  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    val len = s.length
    val out = new java.lang.StringBuilder(math.min(len, 1 << 16))
    var p = 0
    while (true) {
      val crlf = s.indexOf("\r\n", p)
      if (crlf < 0) return null // size line never terminated
      val m = SizeLine.matcher(s.substring(p, crlf))
      if (!m.find()) return null // malformed size line
      val sz = Integer.parseInt(m.group(1), 16)
      if (sz == 0) // terminal chunk; trailer section ignored
        return UTF8String.fromString(out.toString)
      val dataStart = crlf + 2
      // advance sz CODE POINTS (the column-substr unit); running off
      // the end means the chunk data is truncated — refuse
      val end =
        try s.offsetByCodePoints(dataStart, sz)
        catch { case _: IndexOutOfBoundsException => return null }
      if (end + 2 > len || s.charAt(end) != '\r' || s.charAt(end + 1) != '\n')
        return null // chunk data not CRLF-terminated
      if (out.length() + (end - dataStart) > MaxOut) return null // bomb
      out.append(s, dataStart, end)
      p = end + 2
    }
    null // unreachable
  }

  def apply(c: Column): Column = columnOf(new DechunkBody(expressionOf(c)))
}
