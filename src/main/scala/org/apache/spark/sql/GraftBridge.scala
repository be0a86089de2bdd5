package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` API: Column ⇄ Catalyst Expression.
  *
  * Spark 4 made the Column↔Expression converters package-private
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Custom Catalyst
  * expressions still need them to surface as user-facing `Column`s, so
  * this one-file shim lives in the `org.apache.spark.sql` package. It is
  * the complete extent of our reliance on non-public API.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
