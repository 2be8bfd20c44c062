package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** `instr` for BINARY columns (round 17): 1-based offset of the first
  * occurrence of `target`'s bytes, 0 when absent — exactly the string
  * `instr` contract, so the byte-domain WARC parse can locate the
  * CRLFCRLF header separator without first decoding the whole record
  * through the latin-1 transport (under which char position == byte
  * position, making this a drop-in for the `instr` it replaces on the
  * [[graft.operators.Warc.warcParseBytes]] hot path). `target` is a
  * plan-time constant (ASCII; its latin-1 bytes are the needle). */
case class BytesIndexOf(child: Expression, target: String)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bytes_index_of"

  @transient private lazy val needle: Array[Byte] =
    target.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  override def nullSafeEval(input: Any): Any =
    BytesIndexOf.compute(input.asInstanceOf[Array[Byte]], needle)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val needleRef = ctx.addReferenceObj("needle", needle, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BytesIndexOf.compute($c, $needleRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BytesIndexOf =
    copy(child = newChild)
}

object BytesIndexOf {

  /** 1-based first occurrence, 0 when absent (the `instr` contract;
    * an empty needle matches at 1, as `instr(s, '')` does). */
  def compute(hay: Array[Byte], needle: Array[Byte]): Int = {
    if (needle.length == 0) return 1
    val last = hay.length - needle.length
    var i = 0
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i + 1
      i += 1
    }
    0
  }

  def apply(c: Column, target: String): Column =
    columnOf(new BytesIndexOf(expressionOf(c), target))
}
