package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Last}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** A whole-operator Catalyst extension: AS-OF JOIN as a first-class
  * logical operator (the SparkSessionExtensions tier above custom
  * expressions — see GraftExtensions).
  *
  * Spark has no built-in as-of join (reference semantics:
  * api-query's "latest observation at each probe time"). Rather than
  * hiding the composition in library code, [[AsOfJoin]] is a real
  * (unresolved) logical node and [[ResolveAsOfJoin]] — injected via
  * `injectResolutionRule` — expands it during analysis into the
  * shuffle-once plan: tag both inputs, union, carry the last
  * observation forward with a `last(struct, ignoreNulls)` window
  * partitioned by the key, keep probe rows. Catalyst then optimizes
  * and codegens the expansion like any hand-written query: ONE
  * shuffle on the key, no per-user range-join pair explosion — the
  * 100 TB-safe as-of plan.
  *
  * Column names are carried unresolved (strings) and resolved against
  * the children once they are analyzed, like built-in UnresolvedStar
  * machinery does.
  */
case class AsOfJoin(
    probe: LogicalPlan,
    obs: LogicalPlan,
    keyCol: String,
    tsCol: String,
    idCol: String,
    valueCol: String)
  extends BinaryNode {

  override def left: LogicalPlan = probe
  override def right: LogicalPlan = obs

  // the node never resolves itself — ResolveAsOfJoin must replace it
  // during analysis (registering GraftExtensions is required)
  override def output: Seq[Attribute] = Nil
  override lazy val resolved: Boolean = false

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(probe = newLeft, obs = newRight)
}

/** Analysis rule expanding [[AsOfJoin]] once both inputs resolve. */
case class ResolveAsOfJoin() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case aj: AsOfJoin if aj.probe.resolved && aj.obs.resolved => expand(aj)
  }

  private def expand(aj: AsOfJoin): LogicalPlan = {
    // Resolve with the session resolver (case sensitivity follows
    // spark.sql.caseSensitive) and fail on ambiguity, matching how
    // every built-in operator binds names; find-first on exact name
    // would silently pick one of two same-named columns.
    def attr(p: LogicalPlan, n: String): Expression = {
      val matches = p.output.filter(a => conf.resolver(a.name, n))
      matches match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"as-of join: column '$n' not found in ${p.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"as-of join: column '$n' is ambiguous, matches ${many.map(_.name)}")
      }
    }

    // The Union below must see IDENTICAL column types on both sides:
    // if any aligned column differs (a hardcoded DoubleType null
    // historically; an int probe key against a long obs key still
    // today), WidenSetOperationTypes wraps the children in cast
    // Projects with fresh exprIds AFTER expand() captured
    // union.output, and everything built above references dangling
    // attributes. Widen each aligned pair to the tightest common type
    // ourselves — explicitly, before the Union exists.
    def widened(n: String): org.apache.spark.sql.types.DataType = {
      val (to, tp) = (attr(aj.obs, n).dataType, attr(aj.probe, n).dataType)
      org.apache.spark.sql.catalyst.analysis.TypeCoercion
        .findTightestCommonType(to, tp).getOrElse(
          throw new IllegalArgumentException(
            s"as-of join: incompatible types for column '$n': $to vs $tp"))
    }
    def cast(e: Expression, to: org.apache.spark.sql.types.DataType): Expression =
      if (e.dataType == to) e else Cast(e, to)
    val (keyT, tsT, idT) = (widened(aj.keyCol), widened(aj.tsCol), widened(aj.idCol))
    // probe rows carry no observation value: a null typed as the OBS
    // side's value type
    val valueType = attr(aj.obs, aj.valueCol).dataType

    // tag and align both sides: (k, ts, eid, v, is_probe)
    val obsProj = Project(Seq(
      Alias(cast(attr(aj.obs, aj.keyCol), keyT), "k")(),
      Alias(cast(attr(aj.obs, aj.tsCol), tsT), "ts")(),
      Alias(cast(attr(aj.obs, aj.idCol), idT), "eid")(),
      Alias(attr(aj.obs, aj.valueCol), "v")(),
      Alias(Literal(0), "is_probe")()), aj.obs)
    val probeProj = Project(Seq(
      Alias(cast(attr(aj.probe, aj.keyCol), keyT), "k")(),
      Alias(cast(attr(aj.probe, aj.tsCol), tsT), "ts")(),
      Alias(cast(attr(aj.probe, aj.idCol), idT), "eid")(),
      Alias(Cast(Literal(null), valueType), "v")(),
      Alias(Literal(1), "is_probe")()), aj.probe)
    val union = Union(Seq(obsProj, probeProj), byName = false,
      allowMissingCol = false)

    val Seq(k, ts, eid, v, isProbe) = union.output

    // carried = last(struct(eid, ts, v) when observation, ignoreNulls)
    //           over (partition by k order by ts, is_probe, eid rows
    //                 unbounded preceding .. current row)
    val obsStruct = CreateNamedStruct(Seq(
      Literal("oid"), eid, Literal("ots"), ts, Literal("oval"), v))
    val tagged = If(EqualTo(isProbe, Literal(0)), obsStruct,
      Literal.create(null, obsStruct.dataType))
    val spec = WindowSpecDefinition(
      Seq(k),
      Seq(SortOrder(ts, Ascending), SortOrder(isProbe, Ascending),
        SortOrder(eid, Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    val carried = Alias(
      WindowExpression(
        AggregateExpression(Last(tagged, ignoreNulls = true), Complete,
          isDistinct = false, None),
        spec), "carried")()
    val win = Window(Seq(carried), Seq(k), spec.orderSpec, union, None)

    val c = carried.toAttribute
    Project(Seq(
      Alias(eid, "probe_id")(),
      Alias(k, aj.keyCol)(),
      Alias(ts, "probe_ts")(),
      Alias(GetStructField(c, 0, Some("oid")), "obs_event_id")(),
      Alias(GetStructField(c, 1, Some("ots")), "obs_ts")(),
      Alias(GetStructField(c, 2, Some("oval")), "obs_value")()),
      Filter(EqualTo(isProbe, Literal(1)), win))
  }
}

/** User-facing API for the custom operator. */
object AsOf {
  /** For every probe row, the latest obs row (same key) with
    * `obs.ts <= probe.ts` — ties broken obs-first, then by id.
    * Output: probe_id, <key>, probe_ts, obs_event_id, obs_ts,
    * obs_value. */
  def join(probe: DataFrame, obs: DataFrame, key: String, ts: String,
      id: String, value: String): DataFrame =
    GraftSqlBridge.ofRows(probe.sparkSession,
      AsOfJoin(GraftSqlBridge.logicalPlan(probe),
        GraftSqlBridge.logicalPlan(obs), key, ts, id, value))
}
