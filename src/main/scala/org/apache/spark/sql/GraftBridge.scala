package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column<->Expression converters —
  * the same technique public Spark extension libraries use to expose
  * custom Catalyst expressions through the Column API (Spark 4 removed
  * the public `new Column(Expression)` constructor). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
