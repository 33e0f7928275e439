package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Evaluate-once optimization barrier: a zero-cost pass-through that
  * reports `deterministic = false`.
  *
  * Why it exists: Catalyst's `CollapseProject` and
  * `PushDownPredicates` freely substitute a projected expression into
  * every downstream use site. For a parse pipeline whose columns are
  * all derived from one expensive chain (concat_ws -> sha2 -> split ->
  * to_timestamp in the normalize stage), that substitution re-derives
  * the whole chain once per filter conjunct and once per output
  * column; past a size threshold the generated code also falls out of
  * JIT-compilable range, and the driver bench showed the two normalize
  * queries at ~49 s for 100 k rows (BENCH_r02) — ~50x the cost of
  * evaluating the chain once.
  *
  * Both rules gate inlining on `producer.deterministic`
  * (CollapseProject.canCollapseExpressions) — so wrapping each parsed
  * column in `Sealed` pins the parse into a single Project that is
  * evaluated exactly once per row, while staying inside whole-stage
  * codegen (doGenCode delegates to the child, like Spark's own
  * TaggingExpression). Column pruning still works — references
  * propagate through — but filters stay above the sealed Project.
  *
  * Trade-off, stated explicitly: predicates written AGAINST sealed
  * columns will not reach the file scan. Use it only on columns that
  * are themselves expensive derivations (where pushing the predicate
  * into the scan would re-derive the chain, a pessimization); never on
  * raw source columns, where scan pushdown is the win.
  */
case class Sealed(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the whole point: opt out of cross-operator substitution
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "sealed"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sealed {
  /** Wrap a column in the barrier. */
  def seal(c: Column): Column =
    GraftSqlBridge.column(Sealed(GraftSqlBridge.expression(c)))

  /** Seal every column of `df` (one Project; the deterministic parse
    * stages below collapse INTO it, so the chain appears once and
    * codegen subexpression elimination dedups shared subtrees). */
  def sealAll(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(df.columns.map(n => seal(org.apache.spark.sql.functions.col(n)).as(n)).toIndexedSeq: _*)
}
