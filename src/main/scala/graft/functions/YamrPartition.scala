package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-exact port of the reference's shuffle partition function
  * (yamr hash_partitioner.py:4-10): the key's UTF-8 bytes read as one
  * big-endian arbitrary-precision unsigned integer, mod the partition
  * count — 0-based (the mapper adds +1 for its 1-based regions,
  * mapper.py:129-131).
  *
  * Pinned by the reference's own goldens (tests/test_partition.py:43-47):
  * get_partition("aa",·,3)=2, ("moasold",·,3)=1, ("bbsa",·,4)=1.
  *
  * Implemented as a native Catalyst expression with codegen (SURVEY §7.4):
  * `repartition(n, yamr_partition($"key", n))` reproduces the reference's
  * data placement when partition-level parity matters; everywhere else the
  * engine uses Spark's murmur3 `HashPartitioner` (same semantics, O(1)).
  */
case class YamrPartition(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "yamr_partition"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    left.dataType match {
      case _: org.apache.spark.sql.types.StringType =>
        if (right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"yamr_partition: n must be INT, got ${right.dataType.sql}")
      case other => TypeCheckResult.TypeCheckFailure(
        s"yamr_partition: key must be STRING, got ${other.sql}")
    }
  }

  override def nullSafeEval(key: Any, n: Any): Any =
    YamrPartition.compute(key.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, n) =>
      s"graft.functions.YamrPartition.compute($k, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): YamrPartition =
    copy(left = newLeft, right = newRight)
}

object YamrPartition {
  /** bigint(utf8_bytes(key)) mod n; empty key ⇒ BigInteger(1, []) = 0. */
  def compute(key: UTF8String, n: Int): Int = {
    if (n <= 0)
      throw new IllegalArgumentException(s"yamr_partition: n must be positive, got $n")
    val bytes = key.getBytes
    if (bytes.isEmpty) 0
    else new BigInteger(1, bytes).mod(BigInteger.valueOf(n.toLong)).intValue()
  }

  def apply(key: Column, n: Int): Column =
    columnOf(new YamrPartition(expressionOf(key), Literal(n)))
}
