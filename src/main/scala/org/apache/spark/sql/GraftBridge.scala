package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge for extension libraries: Column ↔ Expression conversion
  * is `private[sql]` in Spark 4 (classic.ExpressionUtils); this re-exports
  * the two conversions graft's custom expressions need. Standard practice
  * for Catalyst extension packages. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
