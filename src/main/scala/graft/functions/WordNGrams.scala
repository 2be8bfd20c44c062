package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd word n-grams (ALL occurrences, in order — the
  * non-distinct sibling of [[WordShingles]]), value-identical to
  * `transform(sequence(1, size(t)-n+1), i -> concat_ws(" ", t[i..i+n-1]))`
  * guarded by `size(t) >= n`. Feeds the bigram/decontamination
  * generators (q64, q78, q79, q85) with one compiled loop per row.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNGrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  private val space = UTF8String.fromString(" ")

  /** All w-grams in order; empty when the array has fewer than w items. */
  def compute(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    val parts = new Array[UTF8String](w)
    var i = 0
    while (i <= n - w) {
      var j = 0
      while (j < w) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(toks: Column, n: Int): Column =
    columnOf(new WordNGrams(expressionOf(toks), n))
}

/** Native codegen'd ordered-pair explosion for the grouped-explosion
  * dedup path: all (a(i), a(j)) with i &lt; j as an array of structs —
  * value-identical to
  * `flatten(transform(a, (x, i) -> transform(slice(a, i + 2, size(a)),
  * y -> named_struct('da', x, 'db', y))))` but one compiled double loop
  * instead of nested interpreted lambdas over (up to df-cap)-element
  * doc lists. Long-typed: the call site pairs doc ids.
  */
case class OrderedPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("da", LongType, nullable = false),
      StructField("db", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "ordered_pairs"

  override def nullSafeEval(input: Any): Any =
    OrderedPairs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.OrderedPairs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

object OrderedPairs {
  /** C(n,2) (a(i), a(j)) i&lt;j pairs, i-major then j order. */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    // Int arithmetic n*(n-1)/2 overflows above ~65k elements (a negative
    // allocation size); internal call sites are df-capped at 10k but the
    // expression is public Column API — size in Long and fail loudly
    val nPairs = n.toLong * (n - 1) / 2
    require(nPairs <= Int.MaxValue,
      s"ordered_pairs: $n elements would produce $nPairs pairs (> Int.MaxValue); " +
        "cap the per-group list (e.g. a document-frequency cap) before exploding")
    val out = new Array[Any](nPairs.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(x, a.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(a: Column): Column = columnOf(new OrderedPairs(expressionOf(a)))
}
