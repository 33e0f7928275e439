package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM under Test/fork). */
object TestSession {
  lazy val spark: SparkSession = Engine.session("graft-test", "8")
}

trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf: String = "/root/testdata/sf0.001"

  def run(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  /** Formatted physical plan, for scale assertions (broadcast, pushdown). */
  def plan(df: DataFrame): String = df.queryExecution.explainString(
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Final physical plan after AQE re-optimization (runs the query). */
  def executedPlan(df: DataFrame): org.apache.spark.sql.execution.SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Flatten a physical plan, recursing through AQE query-stage
    * boundaries (QueryStageExec.children is Nil by design). */
  def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: flattenPlan(q.plan)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: flattenPlan(a.executedPlan)
    case _ => p +: p.children.flatMap(flattenPlan)
  }

  def hasWholeStageCodegen(df: DataFrame): Boolean =
    flattenPlan(executedPlan(df))
      .exists(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
}
