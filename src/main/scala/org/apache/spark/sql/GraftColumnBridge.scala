package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters (Spark 4
  * moved Column onto ColumnNode; classic.ExpressionUtils is the supported
  * internal path). Lets graft wrap its native Catalyst expressions as
  * Columns without routing through the session function registry — the
  * derive() projections must not depend on registration order.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
