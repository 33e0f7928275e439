package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash (Charikar '02) bit-vote aggregation as a single native
  * aggregate: input is the per-token 60-bit hash, buffer is 60 ones
  * counters + a token count, output is the fused 60-bit signature
  * (bit j set iff tokens with bit j set outnumber those without —
  * `2*ones_j > n`, ties to 0, matching the classic sum(+1/-1) > 0).
  *
  * Why not 60 scalar `sum(when(shiftright...))` aggregates: that
  * shape plans 60 independent aggregate buffers and 60 expression
  * trees evaluated per input row, then a 60-term bitwise-OR fold in a
  * follow-up projection. One typed buffer does one pass, and
  * partial/merge stay map-side combinable (the buffer is 488 bytes,
  * so the shuffle carries one small blob per (partition, doc) instead
  * of 60 columns).
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val Bits = 60

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Bits + 1)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val th = v.asInstanceOf[Long]
      var j = 0
      while (j < Bits) { b(j) += (th >>> j) & 1L; j += 1 }
      b(Bits) += 1L
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= Bits) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = {
    val n = b(Bits)
    var sim = 0L
    var j = 0
    while (j < Bits) {
      if (2L * b(j) > n) sim |= 1L << j
      j += 1
    }
    sim
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate((Bits + 1) * 8)
    var i = 0
    while (i <= Bits) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Array[Long](Bits + 1)
    var i = 0
    while (i <= Bits) { b(i) = bb.getLong(); i += 1 }
    b
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  // SQL-registered (GraftExtensions): reject non-long inputs at
  // analysis instead of casting garbage in update()
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT token-hash argument, got ${other.simpleString}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimhashAgg =
    copy(child = newChild)
}

object SimhashAgg {
  /** Aggregate Column: 60-bit simhash of the token-hash column. */
  def simhashAgg(tokenHash: Column): Column =
    GraftSqlBridge.column(
      SimhashAgg(GraftSqlBridge.expression(tokenHash)).toAggregateExpression())
}
