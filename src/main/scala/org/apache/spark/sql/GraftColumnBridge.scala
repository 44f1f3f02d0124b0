package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public `new Column(Expression)` constructor (Column
  * is now backed by a ColumnNode); the converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is private[sql].
  * This bridge re-exports the two conversions for graft's custom Catalyst
  * expressions — the standard extension-library trick.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
