package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd RIFF/WAVE `data`-chunk SIZE over a `binary` column —
  * the payload-extent half of the WAV decode ([[WavMeta]] reads the
  * `fmt ` fields; this walks the same chunk sequence to the `data` chunk
  * and returns its byte size as a long, null when the payload is not a
  * parseable WAV or carries no data chunk). Sample-count arithmetic
  * (`data_len DIV blockAlign`) stays in the query where the oracle can
  * replay it. Same static-helper codegen shape as [[WavMeta]]: one call
  * from generated code, loop stays off the expression tree.
  */
case class WavDataLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_data_len expects a binary arg, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val len = WavDataLen.dataLen(input.asInstanceOf[Array[Byte]])
    if (len < 0L) null else len
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val p = ctx.freshName("wavDataLen")
      s"""
         |long $p = graft.functions.WavDataLen.dataLen($c);
         |if ($p < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $p; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavDataLen {

  /** `wav_data_len(content)` as a Column. */
  def apply(c: Column): Column =
    ColumnBridge.column(WavDataLen(ColumnBridge.expression(c)))

  /** `data` chunk size in bytes, -1 if not a parseable WAV with one. */
  def dataLen(b: Array[Byte]): Long = {
    if (b.length < 12 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return -1L
    var i = 12
    while (i + 8 <= b.length) {
      val sizeL = le32(b, i + 4)
      if (sizeL < 0 || i + 8 + sizeL > b.length) return -1L
      if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a')
        return sizeL
      val size = sizeL.toInt
      i += 8 + size + (size & 1) // chunks pad to even offsets
    }
    -1L
  }

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
}
