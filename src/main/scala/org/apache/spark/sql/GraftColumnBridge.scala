package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to construct `Column`s from Catalyst `Expression`s (and
  * back) in Spark 4.x, where the conversion helpers are `private[sql]`.
  * Lives in the `org.apache.spark.sql` package solely for access; contains
  * no logic of its own.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
