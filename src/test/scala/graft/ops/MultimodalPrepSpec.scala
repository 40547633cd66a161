package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** The media-prep stages the round-10 brief names beyond decode: resize
  * planning (q_multimodal_resize) and uniform temporal frame sampling
  * (q_multimodal_frames). Both are cross-checked against independent JVM
  * recomputations over the ACTUAL payload bytes / parsed metadata, so the
  * codegen byte sampling and the integer timestamp arithmetic are pinned
  * end-to-end, not just oracle-mirrored.
  */
class MultimodalPrepSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("resize aspect-fits into the 224 box with the long side exact") {
    val rows = Multimodal.qMultimodalResize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val (ow, oh) = (r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))
      // the long side lands exactly on 224 (m*224 DIV m); the short side
      // floor-scales and never exceeds the box
      if (w >= h) { assert(ow === 224L); assert(oh === h * 224 / w) }
      else { assert(oh === 224L); assert(ow === w * 224 / h) }
      assert(ow >= 1 && ow <= 224 && oh >= 1 && oh <= 224)
    }
  }

  test("resize decimation checksum matches a JVM byte-walk of the payload") {
    val content = Multimodal.imageTable(spark, sf)
      .select(col("doc_id"), col("content")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("content")).toMap
    val out = Multimodal.qMultimodalResize(spark, sf).collect()
    assert(out.length === content.size)
    out.foreach { r =>
      val bytes = content(r.getAs[Long]("doc_id"))
      val stride = ((bytes.length + 63) / 64).toLong
      assert(r.getAs[Long]("stride") === stride)
      val sampled = (0L until bytes.length.toLong by stride)
        .map(p => (bytes(p.toInt) & 0xff).toLong)
      assert(r.getAs[Long]("n_sampled") === sampled.length.toLong)
      assert(r.getAs[Long]("checksum") === sampled.sum)
    }
  }

  test("frame sampling emits 8 in-range centered timestamps per video") {
    val rows = Multimodal.qMultimodalFrames(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, frames) =>
      assert(frames.length === 8)
      val sorted = frames.sortBy(_.getAs[Long]("frame_idx"))
      val dur = sorted.head.getAs[Long]("duration")
      val ts = sorted.head.getAs[Long]("timescale")
      sorted.zipWithIndex.foreach { case (f, i) =>
        val ticks = (2L * i + 1) * dur / 16
        assert(f.getAs[Long]("ts_ticks") === ticks)
        assert(f.getAs[Long]("ts_ms") === ticks * 1000 / ts)
        assert(ticks >= 0 && ticks < dur) // centers never touch either endpoint
      }
      // strictly increasing — a fetch plan with no duplicate seeks
      val seq = sorted.map(_.getAs[Long]("ts_ticks"))
      assert(seq.zip(seq.tail).forall { case (a, b) => a < b })
    }
  }

  test("wav data-len walks past padded chunks; null without a data chunk") {
    def le32(n: Int) = Array[Byte](n.toByte, (n >> 8).toByte, (n >> 16).toByte, (n >> 24).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    val fmt = cc("fmt ") ++ le32(16) ++ new Array[Byte](16)
    val payload = "abcdefghij".getBytes("US-ASCII") // 10 data bytes
    // LIST chunk of ODD size 5 → the walk must skip its pad byte to land
    // on fmt, then data
    val odd = cc("LIST") ++ le32(5) ++ "INFOX".getBytes("US-ASCII") ++ Array[Byte](0)
    val body = odd ++ fmt ++ cc("data") ++ le32(payload.length) ++ payload
    val wav = cc("RIFF") ++ le32(4 + body.length) ++ cc("WAVE") ++ body
    assert(graft.functions.WavDataLen.dataLen(wav) === 10L)
    // fmt-only file: parseable WAV, but no data chunk → null (-1)
    val noData = cc("RIFF") ++ le32(4 + fmt.length) ++ cc("WAVE") ++ fmt
    assert(graft.functions.WavDataLen.dataLen(noData) === -1L)
    // data chunk whose declared size overruns the payload → reject
    val overrun = cc("RIFF") ++ le32(4 + fmt.length + 8) ++ cc("WAVE") ++
      fmt ++ cc("data") ++ le32(99)
    assert(graft.functions.WavDataLen.dataLen(overrun) === -1L)
  }

  test("exif walk honors both byte orders, skips foreign tags, rejects malformed") {
    def hexBytes(s: String) = s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    // II: Make entry first, orientation 6 → walk must skip entry 0
    val le = hexBytes(
      "FFD8 FFE10034 457869660000" +
        "49492A0008000000 0200" +
        "0F010200 06000000 26000000" +
        "12010300 01000000 06000000" +
        "00000000 475241465400" + "FFC00011080010001003011100021101031101")
    assert(graft.functions.ExifOrient.packedOrient(le) === ((0L << 16) | 6L))
    // MM: same structure big-endian, orientation 3
    val be = hexBytes(
      "FFD8 FFE10034 457869660000" +
        "4D4D002A00000008 0002" +
        "010F0002 00000006 00000026" +
        "01120003 00000001 00030000" +
        "00000000 475241465400" + "FFC00011080010001003011100021101031101")
    assert(graft.functions.ExifOrient.packedOrient(be) === ((1L << 16) | 3L))
    // APP1 present but no orientation tag in IFD0 → null (-1)
    val noTag = hexBytes(
      "FFD8 FFE10028 457869660000" +
        "49492A0008000000 0100" +
        "0F010200 06000000 1A000000" +
        "00000000 475241465400")
    assert(graft.functions.ExifOrient.packedOrient(noTag) === -1L)
    // orientation out of the 1..8 domain → reject
    val bad = le.clone(); bad(42) = 9.toByte // II value byte of tag 0x0112
    assert(graft.functions.ExifOrient.packedOrient(bad) === -1L)
    // JPEG without APP1 (straight to SOF0) → null
    val plain = hexBytes("FFD8 FFC00011080010001003011100021101031101")
    assert(graft.functions.ExifOrient.packedOrient(plain) === -1L)
    // truncated TIFF header → reject, no out-of-bounds
    assert(graft.functions.ExifOrient.packedOrient(
      hexBytes("FFD8 FFE10008 457869660000 4949")) === -1L)
  }

  test("exif meta: datetime + gps sub-IFD decode matches doc_id arithmetic on every row") {
    val rows = Multimodal.exifMetaTable(spark, sf)
      .select(col("doc_id"), col("content")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val b = r.getAs[Array[Byte]]("content")
      val dt = (2000 + id % 26) * 10000000000L + (id % 12 + 1) * 100000000L +
        (id % 28 + 1) * 1000000L + (id % 24) * 10000L + (id % 60) * 100L + (id * 7) % 60
      assert(graft.functions.ExifMeta.packedDateTime(b) === dt, s"doc $id")
      val lat = (if ((id / 3) % 2 == 1) -1L else 1L) *
        ((id % 90) * 3600000000L + (id % 60) * 60000000L + ((id * 13) % 6000) * 10000L)
      val lon = (if ((id / 5) % 2 == 1) -1L else 1L) *
        ((id % 180) * 3600000000L + ((id * 3) % 60) * 60000000L + ((id * 17) % 6000) * 10000L)
      assert(graft.functions.ExifMeta.gpsMicroArcsec(b, lon = false) === lat, s"doc $id")
      assert(graft.functions.ExifMeta.gpsMicroArcsec(b, lon = true) === lon, s"doc $id")
      // the inline-SHORT orientation walk still lands among the
      // offset-valued entries of the richer IFD0
      assert((graft.functions.ExifOrient.packedOrient(b) & 0xFFFFL) === id % 8 + 1)
    }
  }

  test("exif meta: malformed payloads reject per-field, no out-of-bounds") {
    import graft.functions.ExifMeta
    val rows = Multimodal.exifMetaTable(spark, sf)
      .select(col("doc_id"), col("content")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("content")).toMap
    val None_ = Long.MinValue
    // absolute offsets: SOI(2) + APP1 hdr(4) + "Exif\0\0"(6) → TIFF at 12
    val tiff = 12
    Seq(rows.keys.find(_ % 2 == 0).get, rows.keys.find(_ % 2 == 1).get).foreach { id =>
      val good = rows(id)
      // zero latitude-degree DENOMINATOR (bytes 4..8 of the rational block
      // at tiff+142) → latitude rejects, longitude and datetime unaffected
      val denZero = good.clone()
      (0 until 4).foreach(i => denZero(tiff + 142 + 4 + i) = 0)
      assert(ExifMeta.gpsMicroArcsec(denZero, lon = false) === None_)
      assert(ExifMeta.gpsMicroArcsec(denZero, lon = true) ===
        ExifMeta.gpsMicroArcsec(good, lon = true))
      assert(ExifMeta.packedDateTime(denZero) === ExifMeta.packedDateTime(good))
      // u32 NUMERATOR above the u31 overflow-safe bound → reject
      val big = good.clone()
      (0 until 4).foreach(i => big(tiff + 142 + i) = 0xFF.toByte)
      assert(ExifMeta.gpsMicroArcsec(big, lon = false) === None_)
      // latitude ref char outside N/S (value byte of GPS entry 0 at
      // tiff+64+8) → reject
      val badRef = good.clone(); badRef(tiff + 64 + 8) = 'X'.toByte
      assert(ExifMeta.gpsMicroArcsec(badRef, lon = false) === None_)
      assert(ExifMeta.gpsMicroArcsec(badRef, lon = true) ===
        ExifMeta.gpsMicroArcsec(good, lon = true))
      // GPS-pointer entry with a non-pointer TYPE (0x0606 reads the same
      // in either byte order) → both coordinates reject
      val badPtr = good.clone()
      badPtr(tiff + 46 + 2) = 0x06.toByte; badPtr(tiff + 46 + 3) = 0x06.toByte
      assert(ExifMeta.gpsMicroArcsec(badPtr, lon = false) === None_)
      assert(ExifMeta.gpsMicroArcsec(badPtr, lon = true) === None_)
      // datetime separator corrupted (tiff+122+4) → datetime rejects,
      // coordinates unaffected
      val badSep = good.clone(); badSep(tiff + 122 + 4) = '-'.toByte
      assert(ExifMeta.packedDateTime(badSep) === -1L)
      assert(ExifMeta.gpsMicroArcsec(badSep, lon = false) ===
        ExifMeta.gpsMicroArcsec(good, lon = false))
      // truncation inside the TIFF block → clean reject, no OOB read
      assert(ExifMeta.packedDateTime(good.take(tiff + 150)) === -1L)
      assert(ExifMeta.gpsMicroArcsec(good.take(tiff + 150), lon = true) === None_)
      // hostile value-offset near Int.MaxValue: the bounds check must
      // fail in Long arithmetic, not wrap into an out-of-range read
      val le = id % 2 == 0
      val off = 0x7FFFFFE8L
      val offLe = Array[Byte]((off & 0xff).toByte, ((off >> 8) & 0xff).toByte,
        ((off >> 16) & 0xff).toByte, ((off >> 24) & 0xff).toByte)
      val offBytes = if (le) offLe else offLe.reverse
      val hostileDt = good.clone() // DateTime entry @34, value field @+8
      (0 until 4).foreach(i => hostileDt(tiff + 34 + 8 + i) = offBytes(i))
      assert(ExifMeta.packedDateTime(hostileDt) === -1L)
      val hostileGps = good.clone() // GPSLatitude entry @76, value field @+8
      (0 until 4).foreach(i => hostileGps(tiff + 76 + 8 + i) = offBytes(i))
      assert(ExifMeta.gpsMicroArcsec(hostileGps, lon = false) === None_)
    }
  }

  test("exif burst dedup: collision groups match a JVM replay of the decoded keys") {
    val rows = Multimodal.qExifBurstDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("lat_cell"), r.getAs[Long]("lon_cell"),
        r.getAs[Long]("hour")) ->
        (r.getAs[Long]("n_photos"), r.getAs[Long]("survivor"),
          r.getAs[Long]("n_dropped"))).toMap
    // the fixture's 500-doc range contains real bursts (ids 360 apart
    // share every key component) — the collision filter must fire
    assert(rows.nonEmpty)
    rows.foreach { case (k, (n, _, dropped)) =>
      assert(n >= 2L, s"group $k"); assert(dropped === n - 1, s"group $k")
    }
    // independent replay: group the arithmetic-derived keys in the JVM
    val ids = Multimodal.exifMetaTable(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expect = ids.groupBy { id =>
      val lat = (if ((id / 3) % 2 == 1) -1L else 1L) *
        ((id % 90) * 3600000000L + (id % 60) * 60000000L + ((id * 13) % 6000) * 10000L)
      val lon = (if ((id / 5) % 2 == 1) -1L else 1L) *
        ((id % 180) * 3600000000L + ((id * 3) % 60) * 60000000L + ((id * 17) % 6000) * 10000L)
      ((lat + 324000000000L) / 36000000000L, (lon + 648000000000L) / 36000000000L,
        id % 24)
    }.filter(_._2.length >= 2)
      .map { case (k, g) => k -> (g.length.toLong, g.min, g.length.toLong - 1) }
    assert(rows === expect)
  }

  test("exif walks never throw: random payloads and point mutations of valid ones") {
    import graft.functions.{ExifMeta, ExifOrient}
    val rnd = new scala.util.Random(13L) // deterministic
    def walkAll(b: Array[Byte]): Unit = {
      ExifMeta.packedDateTime(b)
      ExifMeta.gpsMicroArcsec(b, lon = false)
      ExifMeta.gpsMicroArcsec(b, lon = true)
      ExifMeta.thumbPacked(b)
      ExifOrient.packedOrient(b)
    }
    // pure-random payloads, some with a JPEG SOI + APP1 prefix so the
    // scan enters the TIFF parse with garbage behind it
    (0 until 2000).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(260))
      rnd.nextBytes(b)
      if (i % 3 == 0 && b.length >= 12) {
        b(0) = 0xFF.toByte; b(1) = 0xD8.toByte; b(2) = 0xFF.toByte
        b(3) = 0xE1.toByte; b(4) = 0; b(5) = (b.length - 4).toByte
        b(6) = 'E'; b(7) = 'x'; b(8) = 'i'; b(9) = 'f'; b(10) = 0; b(11) = 0
      }
      walkAll(b) // must return, never throw
    }
    // single-byte mutations of a VALID payload: every position, a few
    // values — the walk must reject or reinterpret, never read OOB
    // (both fixtures: the meta table for the GPS chain, the thumb table
    // for the IFD1 chain)
    Seq(Multimodal.exifMetaTable(spark, sf),
        Multimodal.exifThumbTable(spark, sf)).foreach { t =>
      val good = t.select(col("content")).head().getAs[Array[Byte]](0)
      (0 until good.length).foreach { p =>
        Seq(0x00, 0x7F, 0xFF).foreach { v =>
          val m = good.clone(); m(p) = v.toByte
          walkAll(m)
        }
      }
    }
  }

  test("container walkers never throw: point mutations of valid image/wav/mp4 payloads") {
    import graft.functions.{ImageDims, JpegDqt, Mp4Meta, WavDataLen, WavMeta}
    def walkAll(b: Array[Byte]): Unit = {
      ImageDims.packedDims(b); JpegDqt.firstQuant(b)
      Mp4Meta.packedMeta(b); WavMeta.packedMeta(b); WavDataLen.dataLen(b)
    }
    Seq(Multimodal.imageTable(spark, sf), Multimodal.wavTable(spark, sf),
        Multimodal.mp4Table(spark, sf)).foreach { t =>
      val good = t.select(col("content")).head().getAs[Array[Byte]](0)
      (0 until good.length).foreach { p =>
        Seq(0x00, 0x7F, 0xFF).foreach { v =>
          val m = good.clone(); m(p) = v.toByte
          walkAll(m) // reject or reinterpret, never read OOB
        }
      }
    }
  }

  test("media walkers are SQL-callable through both registration surfaces") {
    Multimodal.exifMetaTable(spark, sf).createOrReplaceTempView("t_exif_sql")
    // the injection path (GraftExtensions) runs for real in the
    // Verify/Bench sessions (GraftSession.builder); the shared TEST
    // session is extensions-free, so pin here that every injection
    // builder constructs — incl. the ExpressionInfo built from a
    // Literal(null)-instantiated expression — against a fresh
    // SparkSessionExtensions (this is what session construction executes)
    new graft.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions)
    // the temp-function surface is then exercised end-to-end below
    graft.GraftSession.registerFunctions(spark)
    val rows = spark.sql(
      """SELECT doc_id, exif_datetime(content) AS dt,
        |  exif_gps_lat(content) AS lat, exif_gps_lon(content) AS lon,
        |  exif_orient(content) & 65535 AS orient,
        |  image_dims(content) AS dims
        |FROM t_exif_sql ORDER BY doc_id""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val dt = (2000 + id % 26) * 10000000000L + (id % 12 + 1) * 100000000L +
        (id % 28 + 1) * 1000000L + (id % 24) * 10000L + (id % 60) * 100L + (id * 7) % 60
      assert(r.getLong(1) === dt)
      assert(!r.isNullAt(2) && !r.isNullAt(3))
      assert(r.getLong(4) === id % 8 + 1)
      assert(!r.isNullAt(5)) // the SOF0 dims walk sees the same payload
    }
    // round 14: the IFD1 walk and the repetition profile ride the same
    // SQL surface
    Multimodal.exifThumbTable(spark, sf).createOrReplaceTempView("t_thumb_sql")
    spark.sql("SELECT doc_id, exif_thumb(content) AS p FROM t_thumb_sql ORDER BY doc_id")
      .collect().foreach { r =>
        val id = r.getLong(0)
        val comp = if (id % 4 == 0) 1L else 6L
        assert(r.getLong(1) === ((comp << 48) | ((68 + id % 8) << 24) | (id % 32 + 4)))
      }
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("t_docs_sql")
    spark.sql("SELECT repetition_profile(text) AS p FROM t_docs_sql LIMIT 5")
      .collect().foreach(r => assert(r.getSeq[Long](0).length === 7))
  }

  test("audio frame grid: 8 in-range sample centers, byte offsets on block boundaries") {
    val rows = Multimodal.qMultimodalAudioFrames(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, frames) =>
      assert(frames.length === 8)
      val sorted = frames.sortBy(_.getAs[Long]("frame_idx"))
      val n = sorted.head.getAs[Long]("n_samples")
      val rate = sorted.head.getAs[Long]("sample_rate")
      val blockAlign = sorted.head.getAs[Long]("byte_off") match {
        case 0L => 1L // first center at sample 0 — recover align below
        case _ => sorted.head.getAs[Long]("byte_off") / sorted.head.getAs[Long]("sample_idx")
      }
      sorted.zipWithIndex.foreach { case (f, i) =>
        val idx = (2L * i + 1) * n / 16
        assert(f.getAs[Long]("sample_idx") === idx)
        assert(idx >= 0 && idx < n) // centers never touch either endpoint
        assert(f.getAs[Long]("ts_us") === idx * 1000000L / rate)
        if (f.getAs[Long]("sample_idx") > 0)
          assert(f.getAs[Long]("byte_off") % f.getAs[Long]("sample_idx") === 0L ||
            f.getAs[Long]("byte_off") === f.getAs[Long]("sample_idx") * blockAlign)
      }
      // non-decreasing seek plan (short clips can repeat a center sample)
      val seq = sorted.map(_.getAs[Long]("byte_off"))
      assert(seq.zip(seq.tail).forall { case (a, b) => a <= b })
    }
  }
}
