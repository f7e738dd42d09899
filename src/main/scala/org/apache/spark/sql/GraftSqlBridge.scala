package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column<->Expression converters — the
  * supported route for libraries that register custom Catalyst expressions
  * (Spark 4 unified `Column` no longer exposes `.expr` publicly).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
