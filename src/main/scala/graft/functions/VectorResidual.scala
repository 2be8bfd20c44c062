package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd centroid residual `v − cents(cell)` over an
  * array&lt;double&gt; vector and an int cell id, with the centroid table
  * baked into the expression (optimization r19, guide §1.2).
  *
  * Value-identical to the HOF form
  * `zip_with(v, element_at(centArr, cell + 1), (a, b) -> a - b)` — same
  * element order, same IEEE subtraction — but compiled:
  * HigherOrderFunction expressions are CodegenFallback, so the zip_with
  * (and, worse, its `centArr` CreateArray subtree — nlist × dim literal
  * evaluations) re-evaluated INTERPRETED per corpus row inside the
  * IVFADC encode/fit projections (q116/q146/q41-family). Pinned
  * bit-identical to the retained reference composition in
  * SimilaritySpec.
  *
  * Inputs must be a `dim`-length vector (embedding construction) and a
  * cell id in [0, nlist); violations throw rather than silently encode
  * a wrong residual.
  */
case class VectorResidual(left: Expression, right: Expression,
    cents: Array[Array[Double]]) extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_residual"

  override def nullSafeEval(v: Any, cell: Any): Any =
    VectorResidual.compute(v.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsVar = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev,
      (v, c) => s"graft.functions.VectorResidual.compute($v, $c, $centsVar)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorResidual =
    copy(left = newLeft, right = newRight)
}

object VectorResidual {
  def compute(v: ArrayData, cell: Int, cents: Array[Array[Double]]): ArrayData = {
    if (cell < 0 || cell >= cents.length)
      throw new IllegalArgumentException(
        s"vector_residual: cell $cell out of [0, ${cents.length})")
    val c = cents(cell)
    val n = v.numElements()
    if (n != c.length)
      throw new IllegalArgumentException(
        s"vector_residual: vector length $n != centroid dim ${c.length}")
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i))
        throw new IllegalArgumentException(s"vector_residual: null element at $i")
      out(i) = v.getDouble(i) - c(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(v: Column, cell: Column, cents: Array[Array[Double]]): Column =
    columnOf(new VectorResidual(expressionOf(v), expressionOf(cell), cents))
}
