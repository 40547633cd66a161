package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** MinHash signature as a single typed-imperative aggregate: for input hash
  * values x (already reduced mod `prime`), maintains
  * `sig[i] = min over rows of (a_i * x + b_i) mod prime` for all hash
  * functions in ONE Array[Long] buffer.
  *
  * Why not 64 separate `min(...)` aggregate columns? That shape exceeds
  * Spark's codegen field limits (`spark.sql.codegen.maxFields`), observed
  * to disable whole-stage codegen for the entire stage (0 codegen spans in
  * the executed plan). One array-buffered aggregate keeps the surrounding
  * stages codegen'd and runs the 64 hash updates as a tight JVM loop.
  *
  * Bit-identical to the column formulation: same coefficients, same
  * `(a*x+b) % p` arithmetic (inputs are in [0, p), p ~ 2^30, so products
  * stay below 2^63 — no overflow under ANSI).
  */
case class MinHashAgg(
    child: Expression,
    coefsA: Array[Long],
    coefsB: Array[Long],
    prime: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val n = coefsA.length

  override def createAggregationBuffer(): Array[Long] = Array.fill(n)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < n) {
        val h = (coefsA(i) * x + coefsB(i)) % prime
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(n)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** `minhash_sig(x)` as an aggregate Column producing array<long>. */
  def apply(x: Column, coefsA: Array[Long], coefsB: Array[Long], prime: Long): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(x), coefsA, coefsB, prime).toAggregateExpression())
}
