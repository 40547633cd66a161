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

  /** Packed byte-order + orientation, -1 if absent or malformed. */
  def packedOrient(b: Array[Byte]): Long = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return -1L
    var i = 2
    while (i + 4 <= b.length && (b(i) & 0xff) == 0xff) {
      val m = b(i + 1) & 0xff
      if (m == 0xda || m == 0xd9) return -1L // entropy data / EOI: no EXIF
      val segLen = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (segLen < 2 || i + 2 + segLen > b.length) return -1L
      if (m == 0xe1 && segLen >= 16 &&
          b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' && b(i + 7) == 'f' &&
          b(i + 8) == 0 && b(i + 9) == 0)
        return fromTiff(b, i + 10, i + 2 + segLen)
      i += 2 + segLen
    }
    -1L
  }

  /** Parse orientation out of the TIFF structure in b[tiff, end). */
  private def fromTiff(b: Array[Byte], tiff: Int, end: Int): Long = {
    if (tiff + 8 > end) return -1L
    val le =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return -1L
    def u16(i: Int): Int =
      if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    if (u16(tiff + 2) != 42) return -1L
    val ifdOff = u32(tiff + 4)
    if (ifdOff < 8 || tiff + ifdOff + 2 > end) return -1L
    val ifd = tiff + ifdOff.toInt
    val n = u16(ifd)
    var j = 0
    while (j < n) {
      val e = ifd + 2 + 12 * j
      if (e + 12 > end) return -1L
      // SHORT values sit left-justified in the 4-byte value field
      if (u16(e) == 0x0112 && u16(e + 2) == 3 && u32(e + 4) == 1L) {
        val v = u16(e + 8)
        return if (v >= 1 && v <= 8) ((if (le) 0L else 1L) << 16) | v else -1L
      }
      j += 1
    }
    -1L
  }
}
