package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * supported way to lift a custom Catalyst Expression into the public
  * Column algebra on Spark 4.x (where `new Column(expr)` no longer
  * exists; Columns wrap ColumnNodes).
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column to its catalyst Expression.
    * `ExpressionUtils.expression` returns a lazy ColumnNodeExpression
    * wrapper whose ColumnNode is NOT serializable — fine inside plans
    * the analyzer rewrites, fatal when the expression is stored in a
    * custom operator and shipped to executors. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Wrap a custom LogicalPlan into a DataFrame (classic.Dataset.ofRows
    * is private[sql]). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
