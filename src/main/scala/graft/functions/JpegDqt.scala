package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd JPEG quantization-table probe over a `binary` column:
  * returns the FIRST entry of the first DQT segment (the DC luminance
  * quantizer — the value every "estimate the encoder's quality setting"
  * heuristic keys on, libjpeg `jpeg_quality_scaling` inverted), or null
  * when the payload has no parseable DQT. Same marker-segment walk as
  * [[ImageDims]] (APP/COM segments are variable-length, so a fixed-offset
  * peek is wrong), same static-helper shape so the walk stays one call
  * inside whole-stage codegen.
  */
case class JpegDqt(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jpeg_dqt expects a binary arg, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = JpegDqt.firstQuant(input.asInstanceOf[Array[Byte]])
    if (v < 0L) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("dqt")
      s"""
         |long $v = graft.functions.JpegDqt.firstQuant($c);
         |if ($v < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegDqt {

  /** `jpeg_dqt(content)` as a Column (first luma quantizer, 1–255). */
  def apply(c: Column): Column =
    ColumnBridge.column(JpegDqt(ColumnBridge.expression(c)))

  /** First entry of the first 8-bit DQT table, -1 if absent/unparseable. */
  def firstQuant(b: Array[Byte]): Long = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return -1L
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return -1L
      val m = b(i + 1) & 0xff
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i += 2
      } else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > b.length) return -1L
        if (m == 0xdb) { // DQT: payload = Pq/Tq byte + 64 entries (8-bit tables)
          if (len < 3 + 64) return -1L
          if ((b(i + 4) & 0xf0) != 0) return -1L // 16-bit tables unsupported
          return (b(i + 5) & 0xff).toLong
        }
        i += 2 + len
      }
    }
    -1L
  }
}
