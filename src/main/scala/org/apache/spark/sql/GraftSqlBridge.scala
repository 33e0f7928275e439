package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to private[sql] Column <-> Expression and plan <-> Dataset
  * conversions (Spark 4 moved them behind
  * org.apache.spark.sql.classic.*). The standard pattern for
  * extension libraries shipping custom Catalyst expressions and
  * logical operators. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (possibly custom/unresolved) logical plan as a DataFrame;
    * analysis — including injected resolution rules — runs on first
    * use, exactly like for built-in operators. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (for composing custom
    * logical operators over existing DataFrames). */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan
}
