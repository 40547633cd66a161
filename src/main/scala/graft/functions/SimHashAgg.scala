package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** SimHash signature as a single typed-imperative aggregate: for input
  * (tokenHash, weight) rows, maintains per-bit weighted sums
  * `w[j] = Σ weight * (bit_j(tokenHash) ? +1 : -1)` in ONE Array[Long]
  * buffer and evaluates to the signature long (`bit_j = w[j] > 0`).
  *
  * Same rationale as [[MinHashAgg]]: `bits` separate `sum(...)` aggregate
  * columns exceed Spark's codegen field limits and disable whole-stage
  * codegen for the entire stage; one array-buffered aggregate keeps the
  * surrounding stages codegen'd and runs the bit loop tight in the JVM.
  *
  * `bits` ≤ 62 so the signature (and every per-bit sum) stays inside a
  * signed long — no overflow under ANSI mode.
  */
case class SimHashAgg(
    left: Expression,
    right: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  require(bits > 0 && bits <= 62, "bits must be in [1, 62]")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val h = left.eval(input)
    val w = right.eval(input)
    if (h != null && w != null) {
      val hash = h.asInstanceOf[Long]
      val weight = w.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        buffer(j) += (((hash >>> j) & 1L) * 2L - 1L) * weight
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < bits) {
      buffer(j) += other(j)
      j += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (buffer(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bits)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getLong())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashAgg =
    copy(left = newLeft, right = newRight)
}

object SimHashAgg {
  /** `simhash_sig(tokenHash, weight)` as an aggregate Column → long. */
  def apply(tokenHash: Column, weight: Column, bits: Int): Column =
    ColumnBridge.column(
      SimHashAgg(
        ColumnBridge.expression(tokenHash),
        ColumnBridge.expression(weight),
        bits).toAggregateExpression())
}
