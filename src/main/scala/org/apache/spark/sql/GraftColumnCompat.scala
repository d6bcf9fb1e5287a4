package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for building `Column`s from custom Catalyst `Expression`s:
  * Spark 4 made the converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so extensions expose
  * them through a shim in the sql package — the same pattern third-party
  * Spark connectors use.
  */
object GraftColumnCompat {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
