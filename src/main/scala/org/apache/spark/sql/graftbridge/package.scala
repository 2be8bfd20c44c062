package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Expression ⇄ Column converters (Spark 4
  * backs Column by ColumnNode; classic converters live in
  * org.apache.spark.sql.classic.ExpressionUtils). Placed in an
  * org.apache.spark.sql subpackage to satisfy the access modifier — the
  * standard pattern for Catalyst extension libraries.
  */
package object graftbridge {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over an arbitrary LogicalPlan (custom operator nodes):
    * `Dataset.ofRows` is `private[sql]` in Spark 4's classic module.
    */
  def dataFrameOf(s: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
