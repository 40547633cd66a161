package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.ops.Multimodal

/** ISO-BMFF box-walk decode: handcrafted box sequences through the static
  * parser, the codegen expression, and the registered q_multimodal_mp4
  * cross-checked against the doc_id arithmetic.
  */
class Mp4MetaSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)

  private def box(tpe: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++ tpe.getBytes ++ body

  private val ftyp = box("ftyp", "isom".getBytes ++ be32(0x200) ++ "isom".getBytes)

  private def mvhdV0(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration))

  private def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array(1.toByte, 0.toByte, 0.toByte, 0.toByte) ++
      be64(0) ++ be64(0) ++ be32(timescale) ++ be64(duration))

  test("packedMeta reads v0 mvhd behind a udta sibling") {
    val moov = box("moov", box("udta", "AAA".getBytes) ++ mvhdV0(1000, 90000))
    assert(Mp4Meta.packedMeta(ftyp ++ moov) === ((1000L << 32) | 90000L))
  }

  test("packedMeta skips unknown top-level boxes before moov") {
    val junk = box("free", Array.fill(5)('B'.toByte)) ++ box("skip", Array.empty)
    val moov = box("moov", mvhdV0(600, 1234))
    assert(Mp4Meta.packedMeta(ftyp ++ junk ++ moov) === ((600L << 32) | 1234L))
  }

  test("packedMeta reads v1 mvhd with u64 duration, rejects one past u32") {
    val ok = box("moov", mvhdV1(48000, 0xFFFFFFFFL))
    assert(Mp4Meta.packedMeta(ftyp ++ ok) === ((48000L << 32) | 0xFFFFFFFFL))
    val over = box("moov", mvhdV1(48000, 0x100000000L))
    assert(Mp4Meta.packedMeta(ftyp ++ over) === -1L)
  }

  test("packedMeta handles the u64 largesize box header") {
    val inner = box("udta", "AB".getBytes) ++ mvhdV0(25, 50)
    val moov = be32(1) ++ "moov".getBytes ++ be64(inner.length + 16L) ++ inner
    assert(Mp4Meta.packedMeta(ftyp ++ moov) === ((25L << 32) | 50L))
  }

  test("packedMeta rejects non-MP4, truncated, and mvhd-free payloads") {
    assert(Mp4Meta.packedMeta("RIFF1234WAVE".getBytes) === -1L)
    val moov = box("moov", mvhdV0(1000, 90000))
    val whole = ftyp ++ moov
    assert(Mp4Meta.packedMeta(whole.dropRight(3)) === -1L) // truncated mvhd
    assert(Mp4Meta.packedMeta(ftyp ++ box("moov", box("udta", Array.empty))) === -1L)
    assert(Mp4Meta.packedMeta(Array.empty[Byte]) === -1L)
  }

  test("expression stays codegen and matches the static parser on the synthesized table") {
    val df = Multimodal.mp4Table(spark, sf)
      .select(col("doc_id"), Mp4Meta(col("content")).as("packed"), col("content"))
    val plan = df.queryExecution.executedPlan
    assert(plan.find(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined)
    df.collect().foreach { r =>
      assert(r.getLong(1) === Mp4Meta.packedMeta(r.getAs[Array[Byte]](2)))
    }
  }

  test("q_multimodal_mp4 matches the doc_id arithmetic") {
    val rows = Multimodal.qMultimodalMp4(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val ts = 600 + (id % 10) * 100
      val sec = id % 3600 + 1
      assert(r.getLong(1) === ts)
      assert(r.getLong(2) === sec * ts)
      assert(r.getLong(3) === sec * 1000)
    }
  }
}
