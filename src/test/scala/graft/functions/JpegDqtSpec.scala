package graft.functions

import graft.SparkFunSuite

/** Byte-level coverage for the [[JpegDqt]] DQT probe: handcrafted streams
  * through the static parser (the end-to-end plan path is hash-gated by
  * q_jpeg_quality's oracle).
  */
class JpegDqtSpec extends SparkFunSuite {

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** SOI + COM of `comLen` bytes + 8-bit DQT whose first entry is `t0`. */
  private def jpegWithDqt(t0: Int, comLen: Int): Array[Byte] =
    Array(0xff, 0xd8).map(_.toByte) ++
      Array(0xff, 0xfe).map(_.toByte) ++ be16(comLen + 2) ++
      Array.fill(comLen)('A'.toByte) ++
      Array(0xff, 0xdb).map(_.toByte) ++ be16(67) ++ Array[Byte](0x00) ++
      (t0 +: Seq.fill(63)(10)).map(_.toByte).toArray

  test("walks variable-length segments to the DQT and reads the DC quantizer") {
    for (com <- Seq(1, 5, 11); t0 <- Seq(2, 16, 80, 255)) {
      assert(JpegDqt.firstQuant(jpegWithDqt(t0, com)) === t0.toLong,
        s"com=$com t0=$t0")
    }
  }

  test("rejects truncated, desynchronized, 16-bit-table, and non-JPEG streams") {
    val ok = jpegWithDqt(16, 3)
    assert(JpegDqt.firstQuant(ok.take(ok.length - 40)) === -1L, "truncated DQT")
    assert(JpegDqt.firstQuant(Array[Byte](0x12, 0x34)) === -1L, "not a JPEG")
    val desync = ok.clone(); desync(2) = 0x00 // segment stream must be FF-led
    assert(JpegDqt.firstQuant(desync) === -1L, "desynchronized")
    val wide = ok.clone()
    wide(ok.length - 65) = 0x10 // Pq=1: 16-bit table, unsupported
    assert(JpegDqt.firstQuant(wide) === -1L, "16-bit table")
    // a stream whose only table-bearing segment is SOF (no DQT) yields null
    val noDqt = Array(0xff, 0xd8).map(_.toByte) ++
      Array(0xff, 0xc0).map(_.toByte) ++ be16(11) ++
      Array[Byte](8) ++ be16(10) ++ be16(10) ++ Array[Byte](3, 1, 2)
    assert(JpegDqt.firstQuant(noDqt) === -1L, "no DQT present")
  }
}
