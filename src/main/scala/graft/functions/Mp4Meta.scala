package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd MP4 (ISO-BMFF) movie-header decode over a `binary`
  * column: returns `timescale << 32 | duration` as a long, or null when
  * the payload is not a parseable MP4. Like [[ImageDims]]/[[WavMeta]],
  * this is metadata WITHOUT a decoder — pure byte arithmetic over the box
  * structure, the production trick for computing per-clip duration across
  * 100 TB of video before any codec touches the samples:
  *
  *  - the file is a sequence of boxes `size:u32 type:4cc payload`
  *    (ISO/IEC 14496-12 §4.2); `size == 1` means a u64 largesize follows
  *    the type, `size == 0` means "to end of file";
  *  - the walk finds the top-level `moov` box, then walks its CHILDREN to
  *    the `mvhd` movie header (children may be preceded by `udta`/`iods`/
  *    anything — a fixed-offset peek is wrong);
  *  - `mvhd` version 0 carries u32 creation/modification times, then
  *    u32 timescale + u32 duration; version 1 widens the times and the
  *    duration to u64 (timescale stays u32).
  *
  * The walk lives in a static helper invoked from both interpreted eval
  * and generated code ([[VecDot]] pattern), so the expression stays inside
  * whole-stage codegen as a single call.
  */
case class Mp4Meta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mp4_meta expects a binary arg, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val packed = Mp4Meta.packedMeta(input.asInstanceOf[Array[Byte]])
    if (packed < 0L) null else packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val p = ctx.freshName("mp4Meta")
      s"""
         |long $p = graft.functions.Mp4Meta.packedMeta($c);
         |if ($p < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $p; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4Meta {

  /** `mp4_meta(content)` as a Column (packed `timescale << 32 | duration`). */
  def apply(c: Column): Column =
    ColumnBridge.column(Mp4Meta(ColumnBridge.expression(c)))

  /** `timescale << 32 | duration` from the mvhd box, or -1 when the
    * payload is not MP4-shaped / has no parseable mvhd / carries a v1
    * duration that does not fit u32 (negative sentinel is never a valid
    * packed value — timescales are u32 ≥ 1).
    */
  def packedMeta(b: Array[Byte]): Long = {
    // a real MP4 starts with an ftyp box; cheap reject for other media
    if (b.length < 16 || !isType(b, 4, 'f', 't', 'y', 'p')) return -1L
    var i = 0L
    while (i + 8 <= b.length) {
      val (size, hdr) = boxSize(b, i)
      if (size < hdr || i + size > b.length) return -1L
      if (isType(b, i + 4, 'm', 'o', 'o', 'v'))
        return mvhdInChildren(b, i + hdr, i + size)
      i += size
    }
    -1L
  }

  /** Walk the children of [from, to) for mvhd and decode it. */
  private def mvhdInChildren(b: Array[Byte], from: Long, to: Long): Long = {
    var j = from
    while (j + 8 <= to) {
      val (size, hdr) = boxSize(b, j)
      if (size < hdr || j + size > to) return -1L
      if (isType(b, j + 4, 'm', 'v', 'h', 'd')) {
        val body = j + hdr
        if (body + 4 > to) return -1L
        val version = b(body.toInt) & 0xff
        if (version == 0) {
          if (body + 20 > to) return -1L
          val timescale = be32(b, body + 12)
          val duration = be32(b, body + 16)
          return (timescale << 32) | duration
        } else if (version == 1) {
          if (body + 32 > to) return -1L
          val timescale = be32(b, body + 20)
          val duration = be64(b, body + 24)
          if (duration < 0L || duration > 0xFFFFFFFFL) return -1L
          return (timescale << 32) | duration
        } else return -1L
      }
      j += size
    }
    -1L
  }

  /** (total box size, header length) at offset i — handles the u64
    * largesize escape and the size-0 "extends to end" form.
    */
  private def boxSize(b: Array[Byte], i: Long): (Long, Long) = {
    val s = be32(b, i)
    if (s == 1L) {
      if (i + 16 > b.length) (-1L, 16L) else (be64(b, i + 8), 16L)
    } else if (s == 0L) (b.length - i, 8L)
    else (s, 8L)
  }

  private def isType(b: Array[Byte], i: Long, c1: Char, c2: Char, c3: Char, c4: Char): Boolean =
    i + 4 <= b.length && b(i.toInt) == c1.toByte && b(i.toInt + 1) == c2.toByte &&
      b(i.toInt + 2) == c3.toByte && b(i.toInt + 3) == c4.toByte

  private def be32(b: Array[Byte], i: Long): Long =
    ((b(i.toInt) & 0xffL) << 24) | ((b(i.toInt + 1) & 0xffL) << 16) |
      ((b(i.toInt + 2) & 0xffL) << 8) | (b(i.toInt + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Long): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
}
