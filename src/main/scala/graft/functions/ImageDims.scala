package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd image-header dimension decode over a `binary` column:
  * returns `width << 32 | height` as a long, or null when the payload is
  * not a parseable PNG/JPEG header. This is the real (non-stub) slice of
  * the multimodal surface — pure byte arithmetic on the first bytes of the
  * payload, no codec library:
  *
  *  - PNG: the IHDR chunk is mandatory-first (PNG spec §11.2.2), so width
  *    and height are the fixed big-endian u32s at offsets 16 and 20 after
  *    the 8-byte signature + 4-byte length + "IHDR" tag.
  *  - JPEG: walks the marker-segment stream from SOI (each segment is
  *    `FF marker len16 payload`, len includes itself) until a SOFn frame
  *    header (C0–C3, C5–C7, C9–CB, CD–CF), whose payload is
  *    `precision u8, height u16, width u16, …`. The walk is required —
  *    APP/COM segments before the frame header have variable length.
  *
  * The loop lives in a static helper invoked from both interpreted eval
  * and the generated code, so the expression stays inside whole-stage
  * codegen as a single call — the [[VecDot]] pattern for logic too
  * control-flow-heavy to inline as an expression tree.
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_dims expects a binary arg, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val packed = ImageDims.packedDims(input.asInstanceOf[Array[Byte]])
    if (packed < 0L) null else packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val p = ctx.freshName("imgDims")
      s"""
         |long $p = graft.functions.ImageDims.packedDims($c);
         |if ($p < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $p; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDims {

  /** `image_dims(content)` as a Column (packed `width << 32 | height`). */
  def apply(c: Column): Column =
    ColumnBridge.column(ImageDims(ColumnBridge.expression(c)))

  /** `width << 32 | height` of a PNG or JPEG payload, -1 if unparseable.
    * Negative sentinel (never a valid packed value: widths are u32) keeps
    * the generated code branch-simple.
    */
  def packedDims(b: Array[Byte]): Long = {
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      (be32(b, 16) << 32) | be32(b, 20)
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return -1L // desynchronized stream
        val m = b(i + 1) & 0xff
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i += 2 // standalone marker, no length field
        } else {
          val len = be16(b, i + 2)
          if (len < 2 || i + 2 + len > b.length) return -1L
          val sof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (sof) {
            if (len < 7) return -1L
            val h = be16(b, i + 5)
            val w = be16(b, i + 7)
            return (w.toLong << 32) | h.toLong
          }
          i += 2 + len
        }
      }
      -1L
    } else -1L
  }

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
}
