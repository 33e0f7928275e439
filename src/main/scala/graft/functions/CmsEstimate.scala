package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch, key)` — point lookup against a serialized
  * Count-Min sketch (the estimateCount side of Catalyst's own
  * `count_min_sketch` aggregate, which Spark ships with no companion
  * query function). Eval-only (CodegenFallback) by design: the probe
  * side is a handful of heavy-hitter candidates joined against a
  * sketch literal, never a per-row hot path — the sketch itself is
  * what scanned the 100 TB, in one mergeable pass.
  *
  * The deserialized sketch is memoized per distinct byte-array
  * OBJECT (a Literal hands eval the same array every row, so the
  * parse happens once per task, not once per row; identity keying is
  * safe because the memo holds a strong reference to the key array).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (binary, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private lazy val memo =
    java.util.Collections.synchronizedMap(
      new java.util.IdentityHashMap[Array[Byte], CountMinSketch]())

  /** Bound on distinct memoized sketches: the intended use hands eval
    * ONE literal array, but the function is SQL-registered, so a
    * per-row sketch column must not grow the memo without limit. */
  private val MemoMax = 16

  override def nullSafeEval(sketchBytes: Any, key: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    var sk = memo.get(bytes)
    if (sk == null) {
      sk = CountMinSketch.readFrom(bytes)
      // evict ONE arbitrary entry at the bound, never clear(): on the
      // documented-but-unenforced misuse path (a non-literal sketch
      // column) a clear would wipe entries other rows of the task are
      // about to re-use, turning every 16th row into a full wipe
      memo.synchronized {
        if (memo.size >= MemoMax) {
          val it = memo.keySet.iterator
          if (it.hasNext) { it.next(); it.remove() }
        }
        memo.put(bytes, sk)
      }
    }
    sk.estimateCount(key.asInstanceOf[java.lang.Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
