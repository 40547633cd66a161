package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd EXIF ORIENTATION decode over a JPEG `binary` column —
  * the rotate-before-resize input every image-prep pipeline needs (a
  * JPEG's pixels are stored unrotated; tag 0x0112 says which of the 8
  * flip/rotate states the camera wrote). The walk is the real thing:
  * JPEG marker scan to APP1 → `Exif\0\0` → TIFF header with EITHER byte
  * order (`II` little / `MM` big — both occur in the wild and the parse
  * must honor the header, not assume one) → IFD0 entry scan skipping
  * unrelated tags → SHORT value left-justified in the 4-byte field.
  * Returns `orderBit << 16 | orientation` (orderBit 0=II, 1=MM), null
  * when the payload is not a JPEG with a well-formed IFD0 orientation.
  * Same static-helper codegen shape as [[ImageDims]]: one call from
  * generated code, loop stays off the expression tree.
  */
case class ExifOrient(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"exif_orient expects a binary arg, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val packed = ExifOrient.packedOrient(input.asInstanceOf[Array[Byte]])
    if (packed < 0L) null else packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val p = ctx.freshName("exifOrient")
      s"""
         |long $p = graft.functions.ExifOrient.packedOrient($c);
         |if ($p < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $p; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExifOrient {

  /** `exif_orient(content)` as a Column
    * (packed `orderBit << 16 | orientation`, orderBit 0=II / 1=MM). */
  def apply(c: Column): Column =
    ColumnBridge.column(ExifOrient(ColumnBridge.expression(c)))

  /** Packed byte-order + orientation, -1 if absent or malformed — the
    * IFD0 SHORT read over the ONE shared walk ([[ExifMeta]]'s marker
    * scan / header parse / entry scan), so the family's parse discipline
    * lives in a single place.
    */
  def packedOrient(b: Array[Byte]): Long = {
    val loc = ExifMeta.findTiff(b)
    if (loc < 0L) return -1L
    val tiff = (loc >>> 32).toInt
    val end = (loc & 0xffffffffL).toInt
    val le = ExifMeta.isLe(b, tiff)
    val i0 = ExifMeta.ifd0(b, tiff, end)
    if (i0 < 0) return -1L
    val e = ExifMeta.findEntry(b, i0, end, le, 0x0112)
    // SHORT(3) count 1, value left-justified in the 4-byte field
    if (e < 0 || ExifMeta.u16(b, e + 2, le) != 3 ||
        ExifMeta.u32(b, e + 4, le) != 1L) return -1L
    val v = ExifMeta.u16(b, e + 8, le)
    if (v >= 1 && v <= 8) ((if (le) 0L else 1L) << 16) | v else -1L
  }
}
