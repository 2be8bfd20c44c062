package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native codegen'd rank bucket: how many of the (sorted, broadcast-as-
  * plan-reference) `boundaries` lie strictly below the child value —
  * `lower_bound` by binary search, O(log n) compares per row.
  *
  * Exists because neither builtin shape survives at n=255 boundaries:
  * the higher-order `aggregate` fold is interpreted per element (no
  * lambda codegen; measured 12 s for one assignment pass over 600k
  * rows), and a chained-`when` binary count re-inlines the accumulator
  * subtree at every level — the expression tree grows ~3^depth and OOMs
  * the planner before codegen even starts (the q41b withCells lesson in
  * a different costume). A reference object + a real loop is bounded
  * and compiled.
  *
  * Semantics match the oracle replay `len(list_filter(bs, b -> v > b))`
  * exactly, including duplicate boundaries (a hot value occupying many
  * quantiles): strictly-below count = lower_bound index.
  */
case class BoundaryBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {
  require(boundaries.nonEmpty, "boundaries must be non-empty")
  // binary search is only correct over a sorted array; an unsorted input
  // would silently violate the "count strictly below" contract (ADVICE r9)
  require(boundaries.indices.drop(1).forall(i => boundaries(i - 1) <= boundaries(i)),
    "boundaries must be non-decreasing")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "boundary_bucket"

  override def nullSafeEval(v: Any): Any =
    BoundaryBucket.compute(v.asInstanceOf[Double], boundaries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.BoundaryBucket.compute($v, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BoundaryBucket =
    copy(child = newChild)
}

object BoundaryBucket {
  /** lower_bound: first index whose boundary is >= v == count of
    * boundaries strictly below v. */
  def compute(v: Double, bounds: Array[Double]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def apply(c: Column, boundaries: Array[Double]): Column =
    columnOf(new BoundaryBucket(expressionOf(c.cast("double")), boundaries))
}
