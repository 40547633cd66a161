package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd whitespace-token count: bit-identical to
  * `size(split(s, "\\s+"))` (Spark's split keeps leading AND trailing
  * empty segments at its default limit −1, so the count is
  * `1 + number of ASCII-whitespace runs`) WITHOUT materializing the token
  * array — a single byte scan where the split formulation allocates one
  * UTF8String per token plus the array, per row. Token counting is the
  * hottest projection of the corpus-assembly pack (mixing, water-filling,
  * packing, padding all reduce documents to their token counts), which is
  * what justifies the custom Expression per SURVEY §7.3.
  *
  * Java's regex `\s` without UNICODE flags is exactly the six ASCII
  * whitespace bytes — all single-byte in UTF-8 — so the byte scan needs
  * no decoding; TokenCountSpec property-pins equality with the split
  * formulation over randomized mixed-whitespace strings.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_count expects a string argument, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nb = s.numBytes()
    var runs = 0
    var inWs = false
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      val ws = b == 32 || b == 9 || b == 10 || b == 11 || b == 12 || b == 13
      if (ws && !inWs) runs += 1
      inWs = ws
      i += 1
    }
    runs + 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val nb = ctx.freshName("tcNb")
      val runs = ctx.freshName("tcRuns")
      val inWs = ctx.freshName("tcInWs")
      val i = ctx.freshName("tcI")
      val b = ctx.freshName("tcB")
      val ws = ctx.freshName("tcWs")
      s"""
         |int $nb = $s.numBytes();
         |int $runs = 0;
         |boolean $inWs = false;
         |for (int $i = 0; $i < $nb; $i++) {
         |  byte $b = $s.getByte($i);
         |  boolean $ws = $b == 32 || $b == 9 || $b == 10 || $b == 11 || $b == 12 || $b == 13;
         |  if ($ws && !$inWs) $runs++;
         |  $inWs = $ws;
         |}
         |${ev.value} = $runs + 1;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCount {
  /** `token_count(s)` as a Column. */
  def apply(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      TokenCount(org.apache.spark.sql.graftbridge.ColumnBridge.expression(s)))
}
