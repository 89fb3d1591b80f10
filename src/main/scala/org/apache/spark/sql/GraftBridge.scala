package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into the `private[sql]` Column ⇄ Expression conversions —
 * Spark 4 removed the public `new Column(expr)` constructor, and extension
 * libraries registering custom Catalyst expressions need exactly these two
 * calls. Nothing else from the private surface is touched.
 */
object GraftBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
