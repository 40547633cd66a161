package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd WAV (RIFF/WAVE) format-chunk decode over a `binary`
  * column — the audio companion of [[ImageDims]]: returns
  * `sampleRate << 32 | channels << 16 | bitsPerSample` as a long, or null
  * when the payload is not a parseable WAV header.
  *
  * RIFF is a chunked container: `"RIFF" size "WAVE"` then a sequence of
  * `(fourcc, size, payload)` chunks, sizes little-endian, chunks padded
  * to even offsets. The `fmt ` chunk (audioFormat u16, numChannels u16,
  * sampleRate u32, byteRate u32, blockAlign u16, bitsPerSample u16, all
  * LE) is NOT guaranteed first — LIST/INFO metadata can precede it — so
  * the decode walks chunks like a real reader. Same static-helper codegen
  * shape as [[ImageDims]]: one call from generated code, loop stays off
  * the expression tree.
  */
case class WavMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_meta expects a binary arg, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val packed = WavMeta.packedMeta(input.asInstanceOf[Array[Byte]])
    if (packed < 0L) null else packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val p = ctx.freshName("wavMeta")
      s"""
         |long $p = graft.functions.WavMeta.packedMeta($c);
         |if ($p < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $p; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavMeta {

  /** `wav_meta(content)` as a Column
    * (packed `sampleRate << 32 | channels << 16 | bitsPerSample`). */
  def apply(c: Column): Column =
    ColumnBridge.column(WavMeta(ColumnBridge.expression(c)))

  /** Packed fmt-chunk fields, -1 if not a parseable WAV. */
  def packedMeta(b: Array[Byte]): Long = {
    if (b.length < 12 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return -1L
    var i = 12
    while (i + 8 <= b.length) {
      val sizeL = le32(b, i + 4)
      if (sizeL < 0 || i + 8 + sizeL > b.length) return -1L
      val size = sizeL.toInt
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (size < 16) return -1L
        val channels = le16(b, i + 10)
        val sampleRate = le32(b, i + 12)
        val bits = le16(b, i + 22)
        return (sampleRate << 32) | (channels.toLong << 16) | bits.toLong
      }
      i += 8 + size + (size & 1) // chunks pad to even offsets
    }
    -1L
  }

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
}
