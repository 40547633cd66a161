package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd Hilbert-curve index of two quantized `[0, 2^bits)`
  * longs — the single-expression form of
  * [[graft.ops.Layout.withHilbertKey]]'s projection-per-bit-level chain
  * (spec-pinned equal over the exhaustive grid). The flip/swap recurrence
  * is control-flow-heavy, so the loop lives in a static helper invoked
  * from both interpreted eval and generated code (the [[VecDot]] /
  * [[ImageDims]] pattern): the whole key is ONE call inside whole-stage
  * codegen, and plans that cluster by it carry one Project node instead
  * of `bits`.
  *
  * Registered as SQL `hilbert_key(x, y, bits)` by
  * [[graft.GraftExtensions]]; `bits` must be a foldable integer in
  * [1, 31].
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hilbert_key expects (bigint, bigint) args, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertKey.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertKey.xy2d($bits, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertKey {

  /** `hilbert_key(a, b, bits)` as a Column. */
  def apply(a: Column, b: Column, bits: Int): Column =
    ColumnBridge.column(
      HilbertKey(ColumnBridge.expression(a), ColumnBridge.expression(b), bits))

  /** The classic xy→d walk (s halving, quadrant digit `(3·rx) xor ry`,
    * conditional flip + swap). Out-of-range coordinate bits above `bits`
    * are ignored by construction (`x & s` only probes in-range planes).
    */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val t = x
        x = y
        y = t
      }
      s >>= 1
    }
    d
  }
}
