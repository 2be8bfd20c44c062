package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.YamrPartition

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst functions for SQL use.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — then
  * `SELECT yamr_partition(key, 8)` works in plain SQL, codegen'd
  * (SURVEY §7.4: the one genuinely custom expression the engine needs).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("yamr_partition"),
      new ExpressionInfo(classOf[YamrPartition].getName, "yamr_partition"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "yamr_partition(key, n) takes 2 arguments")
        YamrPartition(children.head, children(1))
      }))
  }
}
