package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to private[sql] Column <-> Expression conversions (Spark 4
  * moved them behind org.apache.spark.sql.classic.ExpressionUtils).
  * The standard pattern for extension libraries shipping custom
  * Catalyst expressions. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
