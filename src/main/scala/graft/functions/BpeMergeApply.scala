package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One greedy BPE merge pass over a symbol array — the native compiled
  * form of the per-word `aggregate(sequence(...), (out, skip), ...)`
  * fold in the BPE learn loop (optimization r19, guide §1.2): the HOF
  * fold is CodegenFallback (interpreted per element) and its
  * accumulator CONCATs a fresh array per symbol — O(L²) interpreted
  * array copies per word per merge step, over the whole vocabulary,
  * `steps` times.
  *
  * Semantics replicated exactly (the fold's greedy left-to-right scan
  * testing the ROUND-START array, with `skip` consuming the merged
  * right symbol): at position j, if s(j) == l and s(j+1) == r, emit
  * l+r and advance two; else emit s(j) and advance one. Null symbols
  * (impossible by construction) pass through unmatched like the fold's
  * `===` null semantics. Bit-equality to the retained fold is pinned in
  * OperatorsSpec; the q155b/q156-family/q176 oracles replay the identical
  * gaps-and-islands application.
  */
case class BpeMergeApply(child: Expression, l: String, r: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_merge_apply"

  override def nullSafeEval(input: Any): Any =
    BpeMergeApply.compute(input.asInstanceOf[ArrayData],
      UTF8String.fromString(l), UTF8String.fromString(r))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lVar = ctx.addReferenceObj("bpeL", UTF8String.fromString(l),
      "org.apache.spark.unsafe.types.UTF8String")
    val rVar = ctx.addReferenceObj("bpeR", UTF8String.fromString(r),
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeMergeApply.compute($c, $lVar, $rVar)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeApply =
    copy(child = newChild)
}

object BpeMergeApply {

  def compute(s: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = s.numElements()
    val out = new Array[Any](n)
    val lr = UTF8String.concat(l, r)
    var k = 0
    var j = 0
    while (j < n) {
      val cur = if (s.isNullAt(j)) null else s.getUTF8String(j)
      if (cur != null && cur.equals(l) && j + 1 < n && !s.isNullAt(j + 1) &&
          s.getUTF8String(j + 1).equals(r)) {
        out(k) = lr
        j += 2
      } else {
        out(k) = cur
        j += 1
      }
      k += 1
    }
    new GenericArrayData(
      java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], k))
  }

  def apply(s: Column, l: String, r: String): Column =
    columnOf(new BpeMergeApply(expressionOf(s), l, r))
}
