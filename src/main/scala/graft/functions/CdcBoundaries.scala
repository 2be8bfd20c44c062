package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary positions (optimization r18,
  * guide §1.2 per-task work): the sorted 1-based codepoint positions
  * `i ∈ [w, len]` where the polynomial rolling window over the last
  * `w = 8` codepoints hits `Σ coef(j)·cp(i−w+1+j) ≡ 0 (mod 64)` — the
  * EXACT predicate of the declared q196 composition
  * (`ascii(substr(t, k, 1))` per window slot over a per-position
  * explode). One imperative O(len) walk replaces a corpus-chars-sized
  * explode + 8 positional `substr` probes per position (each an
  * O(position) codepoint seek on UTF8String) + the collect_list
  * re-assembly groupBy and its join.
  *
  * Codepoint semantics match the composition exactly: Spark's
  * `length`/`substr` count UTF-8 codepoints (an astral char is ONE
  * position) and `ascii` returns `codePointAt(0)` of the selected
  * character — this walk decodes the same codepoints from the raw
  * UTF-8 bytes. Equality against the original composition is asserted
  * in CdcSpec over ASCII, Latin-1, CJK and astral inputs plus the
  * corpus.
  *
  * Overflow: codepoint ≤ 0x10FFFF, coef ≤ 898641, 8 terms → window sum
  * < 2^44 — exact in the same LONG arithmetic as the composition.
  */
case class CdcBoundaries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcBoundaries.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {

  private val W = 8
  private val DIV = 64
  // 131^7 .. 131^0 mod 2^20 — the q196 window coefficients
  private val COEF =
    Array(376843L, 170969L, 281459L, 898641L, 150939L, 17161L, 131L, 1L)

  /** Strict one-codepoint decode of the character at `off` whose step
    * length (Spark's `UTF8String.numBytesForFirstByte`) is `step`,
    * clamped to the byte range — mirrors what the reference composition
    * computes per position: `substr(t, k, 1)` slices by the SAME step
    * table and `ascii` decodes the slice through Java's UTF-8 decoder,
    * which yields U+FFFD for anything malformed (truncated sequence,
    * invalid lead, overlong form, surrogate range, > U+10FFFF). ADVICE
    * r18: the previous decode read continuation bytes past the end of
    * the array (ArrayIndexOutOfBounds on a truncated tail) and decoded
    * invalid leads differently from the composition. */
  private def decodeChar(bytes: Array[Byte], off: Int, step: Int, n: Int): Long = {
    val b0 = bytes(off) & 0xff
    if (b0 < 0x80) return b0.toLong
    if (off + step > n) return 0xFFFDL // truncated at end of input
    def cont(k: Int): Boolean = (bytes(off + k) & 0xc0) == 0x80
    step match {
      case 2 =>
        if (b0 >= 0xc2 && cont(1)) (((b0 & 0x1f) << 6) | (bytes(off + 1) & 0x3f)).toLong
        else 0xFFFDL // 0xC0/0xC1 overlong, bad continuation, or 0x80–0xBF lead
      case 3 =>
        val b1 = bytes(off + 1) & 0xff
        val ok = cont(1) && cont(2) &&
          (b0 != 0xe0 || b1 >= 0xa0) && // overlong
          (b0 != 0xed || b1 < 0xa0) // UTF-16 surrogate range
        if (ok) (((b0 & 0x0f) << 12) | ((b1 & 0x3f) << 6) |
          (bytes(off + 2) & 0x3f)).toLong
        else 0xFFFDL
      case 4 =>
        val b1 = bytes(off + 1) & 0xff
        val ok = b0 <= 0xf4 && cont(1) && cont(2) && cont(3) &&
          (b0 != 0xf0 || b1 >= 0x90) && // overlong
          (b0 != 0xf4 || b1 < 0x90) // > U+10FFFF
        if (ok) (((b0 & 0x07) << 18) | ((b1 & 0x3f) << 12) |
          ((bytes(off + 2) & 0x3f) << 6) | (bytes(off + 3) & 0x3f)).toLong
        else 0xFFFDL
      case _ => 0xFFFDL // 1-byte 0x80–0xBF leads, 5/6-byte leads
    }
  }

  /** Sorted boundary positions (1-based codepoint index of each window
    * END); empty for strings shorter than the window. Positions step by
    * Spark's own `numBytesForFirstByte` table (clamped at end of input),
    * so char counting matches `length`/`substr` on malformed bytes too. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any]()
    // ring buffer of the last W codepoints
    val ring = new Array[Long](W)
    var filled = 0 // codepoints decoded so far (1-based position of last)
    var off = 0
    while (off < n) {
      val step = UTF8String.numBytesForFirstByte(bytes(off))
      val cp = decodeChar(bytes, off, step, n)
      off += step // may overshoot the end, exactly like numChars
      ring(filled % W) = cp
      filled += 1
      if (filled >= W) {
        // window = positions filled-7 .. filled; ring slot of position p
        // is (p-1) % W, so the OLDEST (coef 376843) sits at filled % W
        var sum = 0L
        var j = 0
        while (j < W) {
          sum += COEF(j) * ring((filled + j) % W)
          j += 1
        }
        if (sum % DIV == 0) out.add(filled.toLong)
      }
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column): Column = columnOf(new CdcBoundaries(expressionOf(c)))
}
