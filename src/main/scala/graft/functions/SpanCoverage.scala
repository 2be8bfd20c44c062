package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document span-coverage fold for the q95 substring dedup — the
  * native rework of [[graft.operators.Dedup]]'s positional coverage
  * pipeline (VERDICT r18 next #3). The OLD shape materialized one row
  * per token position (posexplode), joined the flagged-span difference
  * array on (id, p), ran a per-document cumulative-sum window, and then
  * REBUILT each document with collect_list + array_sort — two
  * corpus-tokens-sized exchanges, a window sort, and an
  * ObjectHashAggregate, all to answer a per-document question. This
  * expression answers it in one compiled pass over the token array:
  *
  *   given the document's tokens and the start positions (1-based) of
  *   its flagged non-first duplicate k-spans, token position i is
  *   covered iff #{s : s ≤ i} − #{s : s ≤ i − k} > 0 — exactly the old
  *   difference-array cumsum (+1 at s, −1 at s + k) — and the output is
  *   (n_tokens, n_kept, n_dropped, clean_text) with clean_text the
  *   UNCOVERED tokens joined by single spaces (concat_ws semantics:
  *   null tokens are counted as kept rows but skipped in the text).
  *
  * Equivalence to the retained window/collect_list reference is pinned
  * by SpanCoverageSpec on fixtures AND the q95/q93b oracles (hash-exact
  * replays of the original pipeline). Inputs: `starts` may arrive in
  * any order (collect_list is unordered) — sorted here; duplicate start
  * positions cannot occur (one gram per position) but would be handled
  * identically to the reference (each contributes +1/−1).
  */
case class SpanCoverage(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 1, s"span length k must be >= 1, got $k")

  override def dataType: DataType = SpanCoverage.schema
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "span_coverage"

  override protected def nullSafeEval(toks: Any, starts: Any): Any =
    SpanCoverage.compute(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, s) => s"graft.functions.SpanCoverage.compute($t, $s, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SpanCoverage =
    copy(left = newLeft, right = newRight)
}

object SpanCoverage {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("n_dropped", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))

  private val space = UTF8String.fromString(" ")

  def compute(toks: ArrayData, starts: ArrayData, k: Int): InternalRow = {
    val n = toks.numElements()
    val m = starts.numElements()
    if (m == 0) {
      // fast path: nothing flagged, the document survives whole
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < n) {
        parts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        i += 1
      }
      return new GenericInternalRow(Array[Any](n.toLong, n.toLong, 0L,
        UTF8String.concatWs(space, parts: _*)))
    }
    val ss = starts.toIntArray()
    java.util.Arrays.sort(ss)
    // two monotone pointers over the sorted starts: cum at position i
    // (1-based) = #{s ≤ i} − #{s ≤ i − k}
    var a = 0 // starts ≤ i
    var b = 0 // starts ≤ i − k
    var kept = 0
    val keptToks = new Array[UTF8String](n)
    var nKeptNonNull = 0
    var i = 1
    while (i <= n) {
      while (a < ss.length && ss(a) <= i) a += 1
      while (b < ss.length && ss(b) <= i - k) b += 1
      if (a - b <= 0) {
        kept += 1
        if (!toks.isNullAt(i - 1)) {
          keptToks(nKeptNonNull) = toks.getUTF8String(i - 1)
          nKeptNonNull += 1
        }
      }
      i += 1
    }
    val text = UTF8String.concatWs(space,
      java.util.Arrays.copyOf(keptToks, nKeptNonNull): _*)
    new GenericInternalRow(Array[Any](n.toLong, kept.toLong,
      (n - kept).toLong, text))
  }

  def apply(toks: Column, starts: Column, k: Int): Column =
    columnOf(new SpanCoverage(expressionOf(toks), expressionOf(starts), k))
}
