package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.FloatVectorDot

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions as SQL functions, so `spark.sql("...
  * float_vector_dot(a, b) ...")` works the same as the Column API.
  *
  * Activate with either
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or the config
  *   spark.sql.extensions=graft.GraftExtensions
  * (the latter works in spark-submit / Thrift server deployments
  * where the session builder is not under the library's control).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("float_vector_dot"),
      new ExpressionInfo(
        classOf[FloatVectorDot].getName, null, "float_vector_dot"),
      exprs => FloatVectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("long_vector_dot"),
      new ExpressionInfo(
        classOf[graft.functions.LongVectorDot].getName, null, "long_vector_dot"),
      exprs => graft.functions.LongVectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(
        classOf[graft.functions.SimhashAgg].getName, null, "simhash_agg"),
      exprs => graft.functions.SimhashAgg(exprs(0)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(
        classOf[graft.functions.CmsEstimate].getName, null, "cms_estimate"),
      exprs => graft.functions.CmsEstimate(exprs(0), exprs(1))))
    // whole-operator extension: expands graft.plans.AsOfJoin during
    // analysis into its shuffle-once union+window plan
    e.injectResolutionRule(_ => graft.plans.ResolveAsOfJoin())
  }
}
