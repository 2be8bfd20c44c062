package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd distinct word w-shingles of a token array.
  *
  * Value-identical to the builtin composition
  * `when(size(t) >= w, array_distinct(transform(sequence(1, size(t)-w+1),
  * j -> concat_ws(" ", t[j], ..., t[j+w-1])))).otherwise(array())`
  * — same space joins (null tokens skipped like concat_ws), same
  * first-occurrence distinct order — but one compiled loop per row
  * instead of three interpreted HigherOrderFunction lambdas per shingle.
  * This is the entry point of every dedup query's hot path (q36, q37,
  * q51, the ScaleProbe corpus).
  */
case class WordShingles(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, s"shingle width must be >= 1, got $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val space = UTF8String.fromString(" ")

  /** Distinct w-grams in first-occurrence order; empty when n < w. */
  def compute(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet == array_distinct's keep-first-occurrence order
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](w)
    var i = 0
    while (i <= n - w) {
      var j = 0
      while (j < w) {
        // concat_ws skips nulls; split-derived tokens are never null, but
        // mirror the builtin exactly anyway
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  def apply(toks: Column, w: Int): Column =
    columnOf(new WordShingles(expressionOf(toks), w))
}
