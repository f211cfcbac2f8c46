package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge for Spark's internal `CollectTopK` aggregate (scoped
  * tighter than `private[sql]` in 4.x). No logic of its own — see
  * `GraftColumnBridge.collectTopK` for the documented public face.
  */
object GraftTopKBridge {
  def collectTopK(child: Expression, k: Int, reverse: Boolean): Expression =
    CollectTopK(child, k, reverse).toAggregateExpression()
}
