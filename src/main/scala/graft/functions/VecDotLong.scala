package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** [[VecDot]] with a LONG accumulator over INTEGRAL-valued double arrays —
  * the exact-integer dot the overflow-free IVF/PQ distance paths need
  * (round 15): `Σ x·s` with per-row quantized components and centroid
  * component-sums stays a bit-exact integer up to 2^63 instead of losing
  * exactness past double's 2^53 (cells of N members have Σx·s ≤ N·2^34 at
  * quantBits 14/dim 64 — long-safe to N ≈ 2^29, double-exact only to
  * N ≈ 2^19, and a 10⁹-vector PQ cell holds ~6·10⁷). Each OPERAND is cast
  * to long first and the product computed in long (a double product would
  * itself round past 2^53 — at N·2^28 per term that binds at N ≈ 2^25,
  * inside the target shape); the DuckDB oracle's `sum(x * s)` HUGEINT
  * aggregation produces the same exact integer, so one round-to-nearest
  * cast on each side yields identical doubles. The accumulation is
  * long-exact while the true dot stays under 2^63 — `centroidParts`
  * guards that DIRECTLY per cell (the Σ|s|·xmax dot-envelope raise,
  * ADVICE r15), so even degenerate near-identical cells cannot reach a
  * wrapping accumulation. Mismatched vector lengths throw (a silent
  * min-truncate would be a plausible wrong dot); non-integral
  * components are the documented caller contract. Same fused-loop
  * codegen shape as [[VecDot]].
  */
case class VecDotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"vec_dot_long needs array args, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot_long expects array<float>/array<double> args, got ${left.dataType}, ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // length mismatch is a caller bug (un-aligned vectors), not data to
    // silently min-truncate into a plausible wrong dot (ADVICE r15); the
    // check is once per row, so it costs nothing against the dim-loop.
    // (Non-integral components remain the documented caller contract —
    // a per-element integrality test would double the loop's work.)
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"vec_dot_long: mismatched vector lengths ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0L
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv.toLong * yv.toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("vecDotLN")
      val acc = ctx.freshName("vecDotLAcc")
      val i = ctx.freshName("vecDotLI")
      val lGet = if (elemType(left) == FloatType) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (elemType(right) == FloatType) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot_long: mismatched vector lengths " + $a.numElements() + " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) ($lGet)) * ((long) ($rGet));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDotLong {
  /** `vec_dot_long(a, b)` as a Column. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
