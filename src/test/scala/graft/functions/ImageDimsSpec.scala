package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.ops.Multimodal

/** Byte-level and end-to-end coverage for the [[ImageDims]] header decode:
  * handcrafted real headers through the static parser, the codegen
  * expression over a DataFrame, and the registered q_multimodal_dims
  * decode cross-checked against the doc_id arithmetic it must recover.
  */
class ImageDimsSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def png(w: Long, h: Long): Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0)

  /** SOI + APP0(JFIF) + COM of `comLen` bytes + SOF0 — the parser must walk
    * the variable-length segments to reach the frame header. */
  private def jpeg(w: Int, h: Int, comLen: Int): Array[Byte] = {
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
      "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val com = Array(0xff, 0xfe).map(_.toByte) ++ be16(comLen + 2) ++
      Array.fill(comLen)('A'.toByte)
    val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(h) ++ be16(w) ++
      Array(3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte)
    Array(0xff, 0xd8).map(_.toByte) ++ app0 ++ com ++ sof0 ++ "payload".getBytes
  }

  test("packedDims reads PNG IHDR width/height at the spec offsets") {
    assert(ImageDims.packedDims(png(640, 480)) === ((640L << 32) | 480L))
    assert(ImageDims.packedDims(png(1, 1)) === ((1L << 32) | 1L))
    // large dims exercise the unsigned u32 path
    assert(ImageDims.packedDims(png(0x80000001L, 2)) === ((0x80000001L << 32) | 2L))
  }

  test("packedDims walks JPEG segments of varying length to SOF0") {
    for (comLen <- 1 to 7)
      assert(ImageDims.packedDims(jpeg(123, 45, comLen)) === ((123L << 32) | 45L),
        s"comLen=$comLen")
  }

  test("packedDims rejects truncated and non-image payloads") {
    assert(ImageDims.packedDims(Array[Byte]()) === -1L)
    assert(ImageDims.packedDims("plain text".getBytes) === -1L)
    assert(ImageDims.packedDims(png(9, 9).take(20)) === -1L) // IHDR cut short
    val noSof = jpeg(5, 5, 3).takeWhile(_ => true).take(24) // ends inside COM
    assert(ImageDims.packedDims(noSof) === -1L)
    // JPEG stream that desynchronizes (segment byte not 0xFF) is rejected
    val bad = jpeg(5, 5, 1)
    bad(2) = 0x00
    assert(ImageDims.packedDims(bad) === -1L)
  }

  test("expression decodes through codegen and nulls out unparseable rows") {
    import spark.implicits._
    val df = Seq(
      (1L, png(320, 200)),
      (2L, jpeg(64, 32, 5)),
      (3L, "not an image".getBytes)).toDF("id", "content")
    val out = df.select(col("id"),
      shiftrightunsigned(ImageDims(col("content")), 32).as("w"),
      ImageDims(col("content")).bitwiseAND(lit(0xFFFFFFFFL)).as("h"))
      .orderBy(col("id")).collect()
    assert(out(0).getLong(1) === 320L && out(0).getLong(2) === 200L)
    assert(out(1).getLong(1) === 64L && out(1).getLong(2) === 32L)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("q_multimodal_dims recovers the doc_id-derived dims by parsing bytes") {
    val out = Multimodal.qMultimodalDims(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === (if (id % 2 == 0) "png" else "jpeg"))
      assert(r.getLong(2) === id % 509 + 16, s"width of doc $id")
      assert(r.getLong(3) === (id * 3) % 479 + 16, s"height of doc $id")
    }
  }
}
