package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** HyperLogLog registers as ONE typed-imperative aggregate: for input
  * 60-bit hashes h, maintains `reg[h mod m] = max(rho)` with
  * `rho = S − bitlength(h >> p)` (S when the window is zero) in a single
  * m-byte buffer — bit-identical to the bucket-keyed SQL formulation in
  * [[graft.ops.Sketches.hllRegisters]] (spec-pinned per register).
  *
  * Why this exists next to the SQL formulation: the register relation
  * shuffles `sources × m` rows (each bucket is a group); this aggregate
  * shuffles `sources` rows each carrying the whole m-byte sketch — the
  * textbook mergeable-sketch shape, m× fewer shuffle rows, with the
  * per-row update a two-instruction loop body instead of a group-by key.
  * The SQL form stays as the oracle-replayable semantics spec; this is
  * the serving-scale build ([[MinHashAgg]] pattern: one array buffer so
  * codegen field limits are never approached).
  *
  * A register value 0 means "never hit" (real rho ≥ 1 because the
  * windowed hash is < 2^(S−1)), matching the SQL form's absent rows.
  */
case class HllRegsAgg(
    child: Expression,
    m: Int,
    p: Int,
    scaleExp: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  require(Integer.bitCount(m) == 1, s"m must be a power of two, got $m")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h % m).toInt
      val w = h >>> p
      val rho =
        if (w == 0L) scaleExp
        else scaleExp - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buffer(bucket)) buffer(bucket) = rho.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any =
    new GenericArrayData(buffer.map(_.toLong))

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegsAgg =
    copy(child = newChild)
}

object HllRegsAgg {
  /** `hll_regs(h)` as an aggregate Column producing array<long> of m
    * registers (0 = never hit).
    */
  def apply(h: Column, m: Int, p: Int, scaleExp: Int): Column =
    ColumnBridge.column(
      HllRegsAgg(ColumnBridge.expression(h), m, p, scaleExp).toAggregateExpression())
}
