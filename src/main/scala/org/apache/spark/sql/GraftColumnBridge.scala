package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private bridge into the classic Column ↔ Expression
  * conversions (`org.apache.spark.sql.classic.ExpressionUtils` is
  * `private[sql]`): the standard Spark-extension idiom for
  * expressions whose constructors carry non-Expression state — here
  * [[graft.functions.NearestCellBcast]]'s Broadcast handle — which
  * the FunctionRegistry path cannot transport. */
object GraftColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
