package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Expression ↔ Column bridge. Spark 4 made `new Column(expr)` private
 * (Column wraps a connect-compatible ColumnNode); `classic.ExpressionUtils`
 * is the blessed internal conversion, scoped `private[sql]` — this tiny
 * shim in the `org.apache.spark.sql` package re-exports exactly the two
 * conversions graft's custom Catalyst expressions need. No other Spark
 * internals are touched.
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
