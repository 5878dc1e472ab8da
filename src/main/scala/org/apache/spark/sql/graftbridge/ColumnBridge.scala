package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression converters — the
  * supported classic-mode hook for attaching a custom Catalyst expression to
  * the public Column API (Spark keeps these package-private to discourage
  * casual use; a custom expression is exactly the sanctioned use).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `Dataset.ofRows` twin: wrap a hand-built logical plan (e.g. a custom
    * operator node) back into the public DataFrame API. The plan goes through
    * the full analyzer, so unresolved attributes inside the custom node
    * resolve against its child like any built-in operator's would.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
