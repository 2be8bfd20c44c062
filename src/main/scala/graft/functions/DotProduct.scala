package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd dot product over two array&lt;double&gt; columns.
  *
  * Value-identical to the higher-order-function form
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)`
  * — the loop accumulates in ascending index order from 0.0, so it is the
  * same sequential fold the DuckDB oracles replay — but compiled into
  * whole-stage codegen instead of interpreted lambda evaluation.
  * HigherOrderFunction expressions don't participate in codegen: every
  * zip_with/aggregate pair allocates an intermediate array and evaluates
  * two closures per element per row, which is the hot path of every
  * cosine/ANN query (q39/q40/q41/q41b/q83). Inputs must be equal-length
  * arrays with no null elements (embedding vectors by construction);
  * violations throw rather than silently yielding a wrong score.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Sequential fold sum of a(i)*b(i), i ascending — bit-identical to the
    * HOF form and the DuckDB list_reduce oracle.
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"dot_product: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"dot_product: null element at $i")
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    columnOf(new DotProduct(expressionOf(a), expressionOf(b)))
}

/** Native codegen'd squared euclidean distance over two array&lt;double&gt;
  * columns — value-identical to
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0.0, (s, v) -> s + v)`
  * (the IVF cell-assignment fold, replayed literally by the q41d/q83
  * oracles), compiled instead of interpreted.
  */
case class SquaredDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "squared_distance"

  override def nullSafeEval(a: Any, b: Any): Any =
    SquaredDistance.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SquaredDistance.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {
  /** Sequential fold sum of (a(i)-b(i))², i ascending. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"squared_distance: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"squared_distance: null element at $i")
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    columnOf(new SquaredDistance(expressionOf(a), expressionOf(b)))
}
