package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd EXIF capture-time decode over a JPEG `binary` column —
  * tag 0x0132 (`DateTime`, ASCII(20) "YYYY:MM:DD HH:MM:SS\0", always
  * OFFSET-valued: 20 > 4 bytes means the value field holds a pointer into
  * the TIFF block, the part of TIFF the inline-orientation walk never
  * exercises). Returns the timestamp packed as the decimal long
  * `yyyymmddHHMMSS` (exact-integer, engine-reproducible — no calendar
  * library, no timezone), null when absent or malformed. Walk discipline
  * as [[ExifOrient]]: marker scan → APP1 `Exif\0\0` → TIFF header honoring
  * EITHER byte order → IFD0 entry scan; same static-helper codegen shape.
  */
case class ExifDateTime(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"exif_datetime expects a binary arg, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = ExifMeta.packedDateTime(input.asInstanceOf[Array[Byte]])
    if (v < 0L) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val p = ctx.freshName("exifDt")
      s"""
         |long $p = graft.functions.ExifMeta.packedDateTime($c);
         |if ($p < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $p; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd EXIF GPS coordinate decode — the geo column an
  * image-dedup / geo-bucketing stage keys on. This is the DEEPEST walk in
  * the EXIF family: IFD0 → tag 0x8825 (GPS IFD **pointer** — a second IFD
  * at a LONG offset) → GPSLatitudeRef/GPSLongitudeRef (ASCII(2), inline,
  * sign) + GPSLatitude/GPSLongitude (RATIONAL(5) × 3 — six offset-valued
  * u32s: (deg,den)(min,den)(sec,den)). Returns the coordinate in SIGNED
  * MICRO-ARCSECONDS (`deg·3 600 000 000 + min·60 000 000 + sec·1 000 000`,
  * each term floor-DIV'd by its denominator — exact integer arithmetic, no
  * float degrees), null when any piece is absent/malformed or a
  * numerator/denominator exceeds u31 (the overflow-safe bound; real EXIF
  * rationals are tiny). `lon = false` reads latitude ('S' negative),
  * `lon = true` longitude ('W' negative).
  */
case class ExifGps(child: Expression, lon: Boolean) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"exif_gps expects a binary arg, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = ExifMeta.gpsMicroArcsec(input.asInstanceOf[Array[Byte]], lon)
    if (v == Long.MinValue) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val p = ctx.freshName("exifGps")
      s"""
         |long $p = graft.functions.ExifMeta.gpsMicroArcsec($c, $lon);
         |if ($p == Long.MIN_VALUE) { ${ev.isNull} = true; } else { ${ev.value} = $p; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd EXIF thumbnail-IFD (IFD1) decode — the embedded
  * preview an image pipeline serves for browse/triage without touching
  * the full-resolution bytes. Walks IFD0's trailing next-IFD pointer to
  * IFD1 and returns `compression << 48 | offset << 24 | length` (see
  * [[ExifMeta.thumbPacked]]), null when the chain is absent or any piece
  * malformed. Same static-helper codegen shape as the sibling walks.
  */
case class ExifThumb(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"exif_thumb expects a binary arg, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = ExifMeta.thumbPacked(input.asInstanceOf[Array[Byte]])
    if (v < 0L) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val p = ctx.freshName("exifThumb")
      s"""
         |long $p = graft.functions.ExifMeta.thumbPacked($c);
         |if ($p < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $p; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** THE TIFF/IFD byte walk of the EXIF expression family — one marker
  * scan, header parse, and entry scan shared by [[ExifOrient]],
  * [[ExifDateTime]], [[ExifGps]] and [[ExifThumb]] so the parse
  * discipline cannot drift between them. Every read is bounds-checked
  * against the APP1 segment end IN LONG ARITHMETIC (a hostile offset
  * near Int.MaxValue must not wrap the check), so a truncated or crafted
  * payload returns the absent sentinel instead of reading out of range.
  *
  * Duplicate-tag rule (ADVICE r13): [[findEntry]] is FIRST-ENTRY-WINS —
  * the first entry carrying the tag decides, and a mistyped first entry
  * rejects the whole payload rather than falling through to a later
  * well-typed duplicate. TIFF requires tags sorted and unique, so a
  * duplicate tag is already a malformed file; rejecting it is the
  * conservative uniform rule every walker in this family now shares.
  */
object ExifMeta {

  /** `exif_datetime(content)` as a Column (packed `yyyymmddHHMMSS`). */
  def dateTime(c: Column): Column =
    ColumnBridge.column(ExifDateTime(ColumnBridge.expression(c)))

  /** `exif_thumb(content)` as a Column (packed thumbnail metadata). */
  def thumb(c: Column): Column =
    ColumnBridge.column(ExifThumb(ColumnBridge.expression(c)))

  /** `exif_gps_lat(content)` as a Column (signed micro-arcseconds). */
  def gpsLat(c: Column): Column =
    ColumnBridge.column(ExifGps(ColumnBridge.expression(c), lon = false))

  /** `exif_gps_lon(content)` as a Column (signed micro-arcseconds). */
  def gpsLon(c: Column): Column =
    ColumnBridge.column(ExifGps(ColumnBridge.expression(c), lon = true))

  /** Locate the TIFF block inside the APP1 EXIF segment:
    * returns `tiffStart << 32 | segEnd` (both ints), or -1.
    */
  private[functions] def findTiff(b: Array[Byte]): Long = {
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
        return ((i + 10).toLong << 32) | (i + 2 + segLen).toLong
      i += 2 + segLen
    }
    -1L
  }

  private[functions] def u16(b: Array[Byte], i: Int, le: Boolean): Int =
    if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private[functions] def u32(b: Array[Byte], i: Int, le: Boolean): Long =
    if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** TIFF header check; returns IFD0 absolute position or -1. */
  private[functions] def ifd0(b: Array[Byte], tiff: Int, end: Int): Int = {
    if (tiff + 8 > end) return -1
    val le =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return -1
    if (u16(b, tiff + 2, le) != 42) return -1
    val off = u32(b, tiff + 4, le)
    if (off < 8L || tiff + off + 2L > end) -1 else tiff + off.toInt
  }

  private[functions] def isLe(b: Array[Byte], tiff: Int): Boolean = b(tiff) == 'I'

  /** Scan the IFD at `ifd` for `tag`; returns the ENTRY position or -1. */
  private[functions] def findEntry(b: Array[Byte], ifd: Int, end: Int, le: Boolean,
      tag: Int): Int = {
    if (ifd < 0 || ifd + 2 > end) return -1
    val n = u16(b, ifd, le)
    var j = 0
    while (j < n) {
      val e = ifd + 2 + 12 * j
      if (e + 12 > end) return -1
      if (u16(b, e, le) == tag) return e
      j += 1
    }
    -1
  }

  /** Packed `yyyymmddHHMMSS` from IFD0 tag 0x0132, -1 if absent/malformed. */
  def packedDateTime(b: Array[Byte]): Long = {
    val loc = findTiff(b)
    if (loc < 0L) return -1L
    val tiff = (loc >>> 32).toInt
    val end = (loc & 0xffffffffL).toInt
    val le = isLe(b, tiff)
    val i0 = ifd0(b, tiff, end)
    if (i0 < 0) return -1L
    val e = findEntry(b, i0, end, le, 0x0132)
    // ASCII(20): "YYYY:MM:DD HH:MM:SS\0" — 20 > 4, so the value field is
    // an offset into the TIFF block
    if (e < 0 || u16(b, e + 2, le) != 2 || u32(b, e + 4, le) != 20L) return -1L
    // offset arithmetic in Long: an offset near 2^31 must fail the bound,
    // not wrap it
    val sL = tiff + u32(b, e + 8, le)
    if (sL < tiff || sL + 20L > end) return -1L
    val s = sL.toInt
    def dig(i: Int): Int = { val c = b(s + i) - '0'; if (c < 0 || c > 9) -1 else c }
    def num(i: Int, n: Int): Long = {
      var v = 0L; var k = 0
      while (k < n) { val d = dig(i + k); if (d < 0) return -1L; v = v * 10 + d; k += 1 }
      v
    }
    if (b(s + 4) != ':' || b(s + 7) != ':' || b(s + 10) != ' ' ||
        b(s + 13) != ':' || b(s + 16) != ':' || b(s + 19) != 0) return -1L
    val y = num(0, 4); val mo = num(5, 2); val d = num(8, 2)
    val h = num(11, 2); val mi = num(14, 2); val sec = num(17, 2)
    if (y < 0 || mo < 0 || d < 0 || h < 0 || mi < 0 || sec < 0) return -1L
    y * 10000000000L + mo * 100000000L + d * 1000000L + h * 10000L + mi * 100L + sec
  }

  /** Thumbnail (IFD1) metadata — completes the TIFF chain family
    * (IFD0 → GPS sub-IFD → IFD1): IFD0's trailing next-IFD pointer leads
    * to the thumbnail IFD, whose Compression (0x0103, SHORT, inline),
    * JPEGInterchangeFormat (0x0201, LONG — the thumbnail's byte offset)
    * and JPEGInterchangeFormatLength (0x0202, LONG) describe the
    * embedded preview. Returns `comp << 48 | off << 24 | len` (offset
    * and length each bounded to u24 — an APP1 segment holds < 2^16
    * bytes, so real values are far smaller), -1 if absent/malformed or
    * if the thumbnail bytes would fall outside the segment.
    */
  def thumbPacked(b: Array[Byte]): Long = {
    val loc = findTiff(b)
    if (loc < 0L) return -1L
    val tiff = (loc >>> 32).toInt
    val end = (loc & 0xffffffffL).toInt
    val le = isLe(b, tiff)
    val i0 = ifd0(b, tiff, end)
    if (i0 < 0) return -1L
    // IFD0's next-IFD pointer sits after its n 12-byte entries
    val n0 = u16(b, i0, le)
    val nextPos = i0 + 2 + 12 * n0
    if (nextPos + 4L > end) return -1L
    val nextOff = u32(b, nextPos, le)
    if (nextOff < 8L || tiff + nextOff + 2L > end) return -1L
    val ifd1 = tiff + nextOff.toInt
    val eComp = findEntry(b, ifd1, end, le, 0x0103)
    if (eComp < 0 || u16(b, eComp + 2, le) != 3 || u32(b, eComp + 4, le) != 1L)
      return -1L
    val comp = u16(b, eComp + 8, le).toLong
    val eOff = findEntry(b, ifd1, end, le, 0x0201)
    if (eOff < 0 || u16(b, eOff + 2, le) != 4 || u32(b, eOff + 4, le) != 1L)
      return -1L
    val off = u32(b, eOff + 8, le)
    val eLen = findEntry(b, ifd1, end, le, 0x0202)
    if (eLen < 0 || u16(b, eLen + 2, le) != 4 || u32(b, eLen + 4, le) != 1L)
      return -1L
    val len = u32(b, eLen + 8, le)
    // the thumbnail bytes themselves must lie inside the segment (Long
    // arithmetic: hostile u32 offsets must fail the bound, not wrap it)
    if (off > 0xffffffL || len > 0xffffffL || len == 0L ||
        tiff + off + len > end) return -1L
    (comp << 48) | (off << 24) | len
  }

  /** Signed micro-arcseconds from the GPS sub-IFD (lat or lon);
    * Long.MinValue if absent/malformed.
    */
  def gpsMicroArcsec(b: Array[Byte], lon: Boolean): Long = {
    val None_ = Long.MinValue
    val loc = findTiff(b)
    if (loc < 0L) return None_
    val tiff = (loc >>> 32).toInt
    val end = (loc & 0xffffffffL).toInt
    val le = isLe(b, tiff)
    val i0 = ifd0(b, tiff, end)
    if (i0 < 0) return None_
    // tag 0x8825: GPS IFD pointer (LONG/SHORT count 1)
    val ep = findEntry(b, i0, end, le, 0x8825)
    if (ep < 0 || u32(b, ep + 4, le) != 1L) return None_
    val ptyp = u16(b, ep + 2, le)
    val gOff =
      if (ptyp == 4) u32(b, ep + 8, le)
      else if (ptyp == 3) u16(b, ep + 8, le).toLong
      else return None_
    if (gOff < 8L || tiff + gOff + 2L > end) return None_
    val gIfd = tiff + gOff.toInt
    // sign from the ASCII(2) ref tag — inline value, first byte is the char
    val eRef = findEntry(b, gIfd, end, le, if (lon) 0x0003 else 0x0001)
    if (eRef < 0 || u16(b, eRef + 2, le) != 2 || u32(b, eRef + 4, le) != 2L)
      return None_
    val refC = (b(eRef + 8) & 0xff).toChar
    val neg =
      if (lon) { if (refC == 'W') true else if (refC == 'E') false else return None_ }
      else { if (refC == 'S') true else if (refC == 'N') false else return None_ }
    // RATIONAL(5) × 3 at an offset: (deg num, den)(min num, den)(sec num, den)
    val eC = findEntry(b, gIfd, end, le, if (lon) 0x0004 else 0x0002)
    if (eC < 0 || u16(b, eC + 2, le) != 5 || u32(b, eC + 4, le) != 3L) return None_
    val rL = tiff + u32(b, eC + 8, le)
    if (rL < tiff || rL + 24L > end) return None_
    val r = rL.toInt
    var uas = 0L
    var t = 0
    while (t < 3) {
      val num = u32(b, r + 8 * t, le)
      val den = u32(b, r + 8 * t + 4, le)
      // u31 bound keeps num·mult inside a long (2^31 · 3.6e9 < 2^63)
      if (den <= 0L || num > Int.MaxValue || den > Int.MaxValue) return None_
      val mult = if (t == 0) 3600000000L else if (t == 1) 60000000L else 1000000L
      uas += num * mult / den
      t += 1
    }
    if (neg) -uas else uas
  }
}
