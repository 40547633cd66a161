package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, processed in partition-batched form.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[fakeDecode]]) — but the Spark-side
  * plumbing is real and is what the 100 TB design cares about: binary
  * payloads never leave the executor, the decode runs batched inside
  * `mapPartitions` (one codec init per partition, the same shape a JNI
  * codec or Python `mapInPandas` worker would use), and features come back
  * as a typed Dataset.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      first_byte: Int,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB decode: in production this would be an image/audio/video codec
    * call on the byte payload (libjpeg/ffmpeg behind JNI, or an Arrow batch
    * handed to a Python worker). Here it derives deterministic pseudo
    * -metadata from the bytes so the full pipeline — including the oracle
    * comparison — stays testable. Feature definitions are mirrored in
    * [[qMultimodalFeaturesSql]].
    */
  def fakeDecode(row: MediaRow): MediaFeatures = {
    val len = row.content.length.toLong
    val first = if (row.content.isEmpty) -1 else row.content(0) & 0xff
    val width = (64 + len % 577).toInt
    val height = (64 + (len * 7) % 419).toInt
    val frames = if (row.media_type == "video") (1 + len % 30).toInt else 1
    MediaFeatures(row.doc_id, row.media_type, len, first, width, height, frames)
  }

  /** `documents` dressed up as a media table: payload = utf-8 bytes of the
    * text, modality assigned round-robin. At 100 TB this is the real shape:
    * parquet binary column + metadata, partitioned by modality.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("content"))

  /** Batched stub-decode over the binary column via typed mapPartitions. */
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .as[MediaRow]
      .mapPartitions { rows =>
        // one "codec init" per partition, then batch-process
        rows.grouped(64).flatMap(batch => batch.map(fakeDecode))
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  val qMultimodalFeaturesSql: String =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  octet_length(encode(text)) AS byte_len,
      |  CASE WHEN octet_length(encode(text)) = 0 THEN -1
      |       ELSE CAST(concat('0x', substring(hex(encode(text)), 1, 2)) AS INT) END AS first_byte,
      |  CAST(64 + octet_length(encode(text)) % 577 AS INTEGER) AS width,
      |  CAST(64 + (octet_length(encode(text)) * 7) % 419 AS INTEGER) AS height,
      |  CASE WHEN doc_id % 3 = 2 THEN CAST(1 + octet_length(encode(text)) % 30 AS INTEGER) ELSE 1 END AS n_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Binary payloads through the plan end-to-end. The binary column flows
    * through projection/sort; the gate output is its hex rendering because
    * the driver's pandas compare cannot hash raw bytes (binary parquet
    * round-trip itself is pinned by MultimodalSpec instead).
    */
  def qMultimodalRoundtrip(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"), col("media_type"),
        hex(col("content")).as("content_hex"),
        octet_length(col("content")).as("byte_len"))
      .orderBy(col("doc_id"))

  val qMultimodalRoundtripSql: String =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  hex(encode(text)) AS content_hex,
      |  octet_length(encode(text)) AS byte_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Container magic bytes per modality (real PNG / RIFF / MPEG-PS
    * signatures — what production payloads carry in their first bytes).
    */
  private val Magic: Map[String, Array[Byte]] = Map(
    "image" -> Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte),
    "audio" -> "RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
    "video" -> Array(0x00.toByte, 0x00.toByte, 0x01.toByte, 0xBA.toByte))

  /** [[mediaTable]] with a REAL container signature prepended to each
    * payload, the input shape for header-based sniffing.
    */
  def mediaTableWithHeaders(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"), col("media_type"),
      concat(
        element_at(
          array(lit(Magic("image")), lit(Magic("audio")), lit(Magic("video"))),
          (col("doc_id") % 3 + 1).cast("int")),
        col("content")).as("content"))

  /** Magic-byte container detection — metadata WITHOUT a decoder: pure
    * codegen byte compares on the binary column (the production trick for
    * routing/validating 100 TB of media before any codec touches it).
    */
  def sniffContainer(content: Column): Column =
    when(hex(substring(content, 1, 4)) === "89504E47", "png")
      .when(hex(substring(content, 1, 2)) === "FFD8", "jpeg")
      .when(hex(substring(content, 1, 4)) === "52494646", "wav")
      .when(hex(substring(content, 1, 4)) === "000001BA", "mpeg")
      .when(hex(substring(content, 5, 4)) === "66747970", "mp4") // ftyp after the size word
      .otherwise("unknown")

  /** Sniffed container per modality. The oracle derives the expected
    * container INDEPENDENTLY (from the doc_id→modality assignment, no
    * byte inspection) — a hash match proves the byte sniffing classified
    * every row correctly.
    */
  def qMultimodalSniff(spark: SparkSession, dir: String): DataFrame =
    mediaTableWithHeaders(spark, dir)
      .select(col("media_type"), sniffContainer(col("content")).as("container"))
      .groupBy(col("media_type"), col("container"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("media_type"), col("container"))

  val qMultimodalSniffSql: String =
    """SELECT media_type, container, count(*) AS n
      |FROM (
      |  SELECT CASE CAST(doc_id % 3 AS INTEGER)
      |           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |         CASE CAST(doc_id % 3 AS INTEGER)
      |           WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mpeg' END AS container
      |  FROM documents)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Image-modality rows carrying REAL container headers: even doc_id gets
    * a PNG signature + IHDR chunk, odd doc_id a JPEG SOI + APP0(JFIF) + a
    * VARIABLE-length COM segment + SOF0 — so a correct JPEG parse must
    * walk the segment stream, not peek a fixed offset. Width/height are
    * pure functions of doc_id; the document text rides behind the header
    * as payload. Headers are assembled as hex strings (codegen concat +
    * unhex), dims big-endian via `lpad(hex(...))`.
    */
  /** The ITU-T T.81 Annex K.1 luminance quantization base table — the
    * libjpeg default every quality setting scales (`jcparam.c`
    * std_luminance_quant_tbl), in natural (row-major) order.
    */
  val JpegBaseQuant: Seq[Int] = Seq(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** libjpeg `jpeg_quality_scaling` for Q = doc_id % 85 + 10, as SQL. */
  private val JpegScaleSql: String =
    "(CASE WHEN (doc_id % 85 + 10) < 50 THEN 5000 DIV (doc_id % 85 + 10) " +
      "ELSE 200 - 2 * (doc_id % 85 + 10) END)"

  def imageTable(spark: SparkSession, dir: String): DataFrame = {
    val w = (col("doc_id") % 509 + 16).cast("long")
    val h = ((col("doc_id") * 3) % 479 + 16).cast("long")
    val comLen = (col("doc_id") % 7 + 1).cast("int")
    val pngHex = concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D49484452"), // IHDR length 13 + tag
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"),
      lit("0806000000"), // bit depth 8, RGBA, deflate, adaptive, no interlace
      lit("00000000")) // CRC not validated by header parsing
    // DQT (round 12): a REAL 64-entry 8-bit luminance quantization table,
    // scaled from the libjpeg standard base table by the per-doc quality
    // setting Q = doc_id % 85 + 10 with the exact jpeg_quality_scaling
    // arithmetic — so [[qJpegQuality]]'s byte-walk estimator has a genuine
    // encoder signal to invert, and its oracle can replay the table entry
    // from doc_id arithmetic alone.
    val dqtBody = concat(JpegBaseQuant.map(v =>
      lpad(hex(expr(s"least(greatest(($v * $JpegScaleSql + 50) DIV 100, 1), 255)")),
        2, "0")): _*)
    val jpegHex = concat(
      lit("FFD8"), // SOI
      lit("FFE000104A46494600010100000100010000"), // APP0 JFIF, len 16
      lit("FFFE"), lpad(hex(comLen + 2), 4, "0"),
      lit("41414141414141").substr(lit(1), comLen * 2), // COM body, 1–7 bytes
      lit("FFDB004300"), dqtBody, // DQT: len 67, Pq/Tq 0, 64 entries
      lit("FFC0001108"), lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"), // SOF0
      lit("03011100021101031101")) // 3 components
    table(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"),
        unhex(concat(
          when(col("doc_id") % 2 === 0, pngHex).otherwise(jpegHex),
          hex(encode(col("text"), "UTF-8")))).as("content"))
  }

  /** Real header decode — the un-stubbed metadata path: sniff the
    * container from magic bytes AND parse width×height out of the PNG
    * IHDR / JPEG SOF0 with the codegen [[graft.functions.ImageDims]]
    * expression. The oracle derives container and dims INDEPENDENTLY from
    * the doc_id arithmetic (no byte inspection), so a hash match proves
    * the byte-level parse of every row. One narrow projection, no
    * shuffle before the sort.
    */
  def qMultimodalDims(spark: SparkSession, dir: String): DataFrame = {
    val packed = graft.functions.ImageDims(col("content"))
    imageTable(spark, dir)
      .select(col("doc_id"),
        sniffContainer(col("content")).as("container"),
        shiftrightunsigned(packed, 32).as("width"),
        packed.bitwiseAND(lit(0xFFFFFFFFL)).as("height"))
      .orderBy(col("doc_id"))
  }

  /** JPEG ENCODER-QUALITY ESTIMATE — the byte-walk dual of the classic
    * "what -quality was this saved at" forensic (ImageMagick/identify's
    * heuristic): read the DC luminance quantizer out of the DQT segment
    * with the codegen [[graft.functions.JpegDqt]] walk and invert libjpeg's
    * `jpeg_quality_scaling` in exact integer arithmetic —
    * `s_est = (100·t0 − 50) DIV 16` (t0 scales the base-table 16), then
    * `q_est = (200 − s_est) DIV 2` below the 50-quality knee and
    * `5000 DIV s_est` above it. The report a curation pipeline uses to
    * route re-compressed/low-quality images out of a training corpus
    * without decoding a single pixel. The oracle derives the table entry
    * from the doc_id arithmetic that synthesized it, so the hash match
    * proves the per-row DQT byte walk AND the estimator; `err_q` bounds
    * the estimator's floor-rounding loss (≤ ~3 at these settings).
    *
    * Scale: one narrow projection over the payload column — the
    * [[qMultimodalDims]] shape; payload bytes never leave the executor.
    */
  def qJpegQuality(spark: SparkSession, dir: String): DataFrame = {
    val t0 = graft.functions.JpegDqt(col("content"))
    imageTable(spark, dir)
      .filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), t0.as("t0"))
      .withColumn("s_est", expr("(100 * t0 - 50) DIV 16"))
      .select(col("doc_id"), col("t0"),
        expr("doc_id % 85 + 10").as("q_true"),
        expr("CASE WHEN s_est <= 100 THEN (200 - s_est) DIV 2 " +
          "ELSE 5000 DIV s_est END").as("q_est"))
      .withColumn("err_q", expr("abs(q_true - q_est)"))
      .orderBy(col("doc_id"))
  }

  val qJpegQualitySql: String =
    s"""WITH j AS (
       |  SELECT doc_id, doc_id % 85 + 10 AS q_true,
       |    CASE WHEN (doc_id % 85 + 10) < 50 THEN 5000 // (doc_id % 85 + 10)
       |         ELSE 200 - 2 * (doc_id % 85 + 10) END AS s
       |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 2 = 1
       |), t AS (
       |  SELECT doc_id, q_true,
       |    least(greatest((16 * s + 50) // 100, 1), 255) AS t0
       |  FROM j
       |), e AS (
       |  SELECT doc_id, t0, q_true, (100 * t0 - 50) // 16 AS s_est FROM t
       |)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(t0 AS BIGINT) AS t0,
       |  CAST(q_true AS BIGINT) AS q_true,
       |  CAST(CASE WHEN s_est <= 100 THEN (200 - s_est) // 2
       |       ELSE 5000 // s_est END AS BIGINT) AS q_est,
       |  CAST(abs(q_true - (CASE WHEN s_est <= 100 THEN (200 - s_est) // 2
       |       ELSE 5000 // s_est END)) AS BIGINT) AS err_q
       |FROM e ORDER BY doc_id""".stripMargin

  val qMultimodalDimsSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS container,
      |  CAST(doc_id % 509 + 16 AS BIGINT) AS width,
      |  CAST((doc_id * 3) % 479 + 16 AS BIGINT) AS height
      |FROM documents
      |WHERE doc_id % 3 = 0
      |ORDER BY doc_id""".stripMargin

  /** Little-endian hex rendering of a numeric column as `bytes` bytes —
    * RIFF sizes/fields are LE, so the big-endian `hex()` gets byte-swapped
    * by reassembling its 2-char groups in reverse.
    */
  private def leHex(c: Column, bytes: Int): Column = {
    val h = lpad(hex(c), bytes * 2, "0")
    concat((0 until bytes).map(i => h.substr(lit(bytes * 2 - 2 * i - 1), lit(2))): _*)
  }

  /** Audio-modality rows carrying REAL RIFF/WAVE headers: a LIST(INFO)
    * metadata chunk of doc_id-VARYING length (odd sizes included, so the
    * even-offset chunk padding rule is exercised) precedes the `fmt `
    * chunk — a correct parse must walk the chunk sequence. Sample rate,
    * channels and bit depth are pure functions of doc_id; the document
    * text rides as the `data` chunk payload.
    */
  def wavTable(spark: SparkSession, dir: String): DataFrame = {
    val channels = (col("doc_id") % 2 + 1).cast("long")
    val rate = (lit(8000) + (col("doc_id") % 40) * 1000).cast("long")
    val bytesPerSample = (col("doc_id") % 3 + 1).cast("long")
    val bits = bytesPerSample * 8
    val listBody = (col("doc_id") % 7 + 1).cast("int") // 1..7 filler bytes
    val listSize = listBody + 4 // "INFO" + filler
    val dataLen = octet_length(encode(col("text"), "UTF-8")).cast("long")
    val riffSize = lit(4L) + 8L + listSize.cast("long") + pmod(listSize.cast("long"), lit(2L)) +
      (8L + 16L) + 8L + dataLen
    val wavHex = concat(
      lit("52494646"), leHex(riffSize, 4), lit("57415645"), // RIFF size WAVE
      lit("4C495354"), leHex(listSize, 4), lit("494E464F"), // LIST size INFO
      lit("41414141414141").substr(lit(1), listBody * 2), // filler
      when(pmod(listSize, lit(2)) === 1, "00").otherwise(""), // even-offset pad
      lit("666D7420"), leHex(lit(16), 4), // fmt , size 16
      leHex(lit(1), 2), leHex(channels, 2), leHex(rate, 4), // PCM, channels, rate
      leHex(rate * channels * bytesPerSample, 4), // byte rate
      leHex(channels * bytesPerSample, 2), leHex(bits, 2), // block align, bits
      lit("64617461"), leHex(dataLen, 4)) // data chunk header
    table(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"),
        unhex(concat(wavHex, hex(encode(col("text"), "UTF-8")))).as("content"))
  }

  /** Real audio-header decode: parse sample rate / channels / bit depth
    * out of the RIFF `fmt ` chunk with the codegen
    * [[graft.functions.WavMeta]] expression. As with [[qMultimodalDims]],
    * the oracle derives the expected fields INDEPENDENTLY from doc_id
    * arithmetic — the hash match proves the chunk walk parsed every row.
    */
  def qMultimodalWav(spark: SparkSession, dir: String): DataFrame = {
    val packed = graft.functions.WavMeta(col("content"))
    wavTable(spark, dir)
      .select(col("doc_id"),
        shiftrightunsigned(packed, 32).as("sample_rate"),
        shiftrightunsigned(packed, 16).bitwiseAND(lit(0xFFFFL)).as("channels"),
        packed.bitwiseAND(lit(0xFFFFL)).as("bits_per_sample"))
      .orderBy(col("doc_id"))
  }

  val qMultimodalWavSql: String =
    """SELECT doc_id,
      |  CAST(8000 + (doc_id % 40) * 1000 AS BIGINT) AS sample_rate,
      |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
      |  CAST((doc_id % 3 + 1) * 8 AS BIGINT) AS bits_per_sample
      |FROM documents
      |WHERE doc_id % 3 = 1
      |ORDER BY doc_id""".stripMargin

  /** Video-modality rows carrying REAL ISO-BMFF (MP4) box structure: an
    * `ftyp` brand box, a `free` box of doc_id-VARYING length, then `moov`
    * whose `mvhd` movie header sits BEHIND a varying-length `udta` child —
    * so a correct parse must walk both the top-level box sequence and the
    * moov children. The mvhd is a spec-complete 108-byte version-0 box
    * (unity matrix, 1.0 rate); timescale and duration are pure functions
    * of doc_id; the document text rides behind `moov` as payload bytes
    * (the walker never reaches them — moov resolves first).
    */
  def mp4Table(spark: SparkSession, dir: String): DataFrame = {
    val timescale = (lit(600) + (col("doc_id") % 10) * 100).cast("long")
    val durationSec = (col("doc_id") % 3600 + 1).cast("long")
    val duration = durationSec * timescale
    val freeLen = (col("doc_id") % 7).cast("int") // 0..6 filler bytes
    val udtaLen = (col("doc_id") % 5).cast("int") // 0..4 filler bytes
    def be32(c: Column): Column = lpad(hex(c), 8, "0")
    val mvhdHex = concat(
      lit("0000006C6D766864"), // size 108, 'mvhd'
      lit("00000000"), // version 0, flags
      lit("0000000000000000"), // creation + modification time
      be32(timescale), be32(duration),
      lit("00010000"), lit("01000000"), // rate 1.0, volume 1.0 + reserved
      lit("0000000000000000"), // reserved[2]
      lit("000100000000000000000000000000000001000000000000000000000000000040000000"), // unity matrix
      lit("0" * 48), // pre_defined[6]
      lit("00000002")) // next_track_ID
    val mp4Hex = concat(
      lit("0000001866747970"), lit("69736F6D00000200"), lit("69736F6D6D703432"), // ftyp isom
      be32(freeLen + 8), lit("66726565"), lit("41414141414141").substr(lit(1), freeLen * 2),
      be32(udtaLen + 124), lit("6D6F6F76"), // moov = udta + mvhd
      be32(udtaLen + 8), lit("75647461"), lit("41414141").substr(lit(1), udtaLen * 2),
      mvhdHex)
    table(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"),
        unhex(concat(mp4Hex, hex(encode(col("text"), "UTF-8")))).as("content"))
  }

  /** Real video-container decode: walk the MP4 box tree to the mvhd and
    * report timescale / duration / exact integer milliseconds with the
    * codegen [[graft.functions.Mp4Meta]] expression. As with the PNG and
    * WAV duals, the oracle derives the expected fields INDEPENDENTLY from
    * doc_id arithmetic — a hash match proves the box walk on every row.
    */
  def qMultimodalMp4(spark: SparkSession, dir: String): DataFrame = {
    val packed = graft.functions.Mp4Meta(col("content"))
    mp4Table(spark, dir)
      .select(col("doc_id"),
        shiftrightunsigned(packed, 32).as("timescale"),
        packed.bitwiseAND(lit(0xFFFFFFFFL)).as("duration"))
      .withColumn("duration_ms", expr("duration * 1000 DIV timescale"))
      .orderBy(col("doc_id"))
  }

  val qMultimodalMp4Sql: String =
    """SELECT doc_id,
      |  CAST(600 + (doc_id % 10) * 100 AS BIGINT) AS timescale,
      |  CAST((doc_id % 3600 + 1) * (600 + (doc_id % 10) * 100) AS BIGINT) AS duration,
      |  CAST((doc_id % 3600 + 1) * 1000 AS BIGINT) AS duration_ms
      |FROM documents
      |WHERE doc_id % 3 = 2
      |ORDER BY doc_id""".stripMargin

  /** Resize planning + payload decimation — the "resize" stage of a media
    * preprocessing pipeline, with the pixel resampler stubbed the same way
    * [[fakeDecode]] stubs the codec. Two halves, both REAL Spark plumbing:
    *
    *  - **Geometry** is exact and un-stubbed: width/height come out of the
    *    actual PNG IHDR / JPEG SOF0 byte parse ([[graft.functions.ImageDims]])
    *    and aspect-fit into a 224×224 box (the CLIP/ViT preprocessing
    *    contract) in pure integer arithmetic — `out = dim·224 DIV max(w,h)`,
    *    so the scale plan any real resampler would execute is fully decided
    *    here, engine-reproducibly.
    *  - **Payload decimation** stands in for pixel resampling: every
    *    `stride`-th byte of the binary column is touched (stride sized so
    *    ≤ 64 samples per row) and folded into an exact integer checksum via
    *    codegen-evaluated higher-order functions (`sequence` → `transform`
    *    → `aggregate`), no UDF boundary — the same per-row bounded-work
    *    shape a JNI resampler has. Payload bytes never leave the executors;
    *    only (dims, stride, checksum) metadata comes back.
    *
    * The oracle rebuilds the byte stream independently (header hex from the
    * doc_id arithmetic + the text payload) and replays the decimation with
    * list lambdas — the hash match proves the byte-level sampling on every
    * row. Linear scan, narrow projection, sort only at presentation.
    */
  def qMultimodalResize(spark: SparkSession, dir: String): DataFrame = {
    val packed = graft.functions.ImageDims(col("content"))
    imageTable(spark, dir)
      .select(col("doc_id"), col("content"),
        shiftrightunsigned(packed, 32).as("width"),
        packed.bitwiseAND(lit(0xFFFFFFFFL)).as("height"))
      .withColumn("out_w", expr("width * 224 DIV greatest(width, height)"))
      .withColumn("out_h", expr("height * 224 DIV greatest(width, height)"))
      .withColumn("byte_len", octet_length(col("content")).cast("long"))
      .withColumn("stride", expr("(byte_len + 63) DIV 64"))
      .withColumn("sampled",
        transform(sequence(lit(1L), col("byte_len"), col("stride")),
          p => conv(hex(col("content").substr(p.cast("int"), lit(1))), 16, 10).cast("long")))
      .select(col("doc_id"), col("width"), col("height"), col("out_w"), col("out_h"),
        col("stride"), size(col("sampled")).cast("long").as("n_sampled"),
        aggregate(col("sampled"), lit(0L), (acc, x) => acc + x).as("checksum"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the image byte stream reassembled as a hex string from the
    * SAME doc_id arithmetic [[imageTable]] uses (PNG signature+IHDR for
    * even ids, JPEG SOI+APP0+COM+SOF0 for odd) + the utf-8 text payload;
    * the decimation replays over hex-pair offsets with list lambdas.
    */
  val qMultimodalResizeSql: String = {
    val base = JpegBaseQuant.mkString("[", ", ", "]")
    val scaleSql = "(CASE WHEN (doc_id % 85 + 10) < 50 THEN 5000 // (doc_id % 85 + 10) " +
      "ELSE 200 - 2 * (doc_id % 85 + 10) END)"
    s"""WITH img AS (
      |  SELECT doc_id,
      |    doc_id % 509 + 16 AS w, (doc_id * 3) % 479 + 16 AS h,
      |    CASE WHEN doc_id % 2 = 0 THEN
      |      concat('89504E470D0A1A0A', '0000000D49484452',
      |        lpad(hex(doc_id % 509 + 16), 8, '0'),
      |        lpad(hex((doc_id * 3) % 479 + 16), 8, '0'),
      |        '0806000000', '00000000')
      |    ELSE
      |      concat('FFD8', 'FFE000104A46494600010100000100010000',
      |        'FFFE', lpad(hex(doc_id % 7 + 3), 4, '0'),
      |        substring('41414141414141', 1, CAST((doc_id % 7 + 1) * 2 AS INT)),
      |        'FFDB004300',
      |        array_to_string(list_transform($base,
      |          v -> lpad(hex(least(greatest((v * $scaleSql + 50) // 100, 1), 255)), 2, '0')), ''),
      |        'FFC0001108',
      |        lpad(hex((doc_id * 3) % 479 + 16), 4, '0'),
      |        lpad(hex(doc_id % 509 + 16), 4, '0'),
      |        '03011100021101031101')
      |    END || hex(encode(text)) AS hx
      |  FROM documents WHERE doc_id % 3 = 0),
      |sized AS (
      |  SELECT doc_id, w, h, hx, length(hx) // 2 AS byte_len,
      |    (length(hx) // 2 + 63) // 64 AS stride
      |  FROM img),
      |sampled AS (
      |  SELECT doc_id, w, h, byte_len, stride,
      |    list_transform(range(1, CAST(byte_len + 1 AS BIGINT), CAST(stride AS BIGINT)),
      |      p -> CAST(concat('0x', substring(hx, CAST(2 * p - 1 AS INT), 2)) AS BIGINT)) AS bytes
      |  FROM sized)
      |SELECT doc_id,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(w * 224 // greatest(w, h) AS BIGINT) AS out_w,
      |  CAST(h * 224 // greatest(w, h) AS BIGINT) AS out_h,
      |  CAST(stride AS BIGINT) AS stride,
      |  CAST(len(bytes) AS BIGINT) AS n_sampled,
      |  CAST(list_sum(bytes) AS BIGINT) AS checksum
      |FROM sampled
      |ORDER BY doc_id""".stripMargin
  }

  /** Uniform temporal frame sampling — the "frame-sample" stage of a video
    * preprocessing pipeline (the TSN segment-sampling discipline, Wang et
    * al. 2016: split the clip into k equal segments and take each
    * segment's CENTER, which trains better than start-anchored sampling
    * and is what the video-pretraining stacks do). The clip duration is
    * NOT metadata handed in — it comes out of the actual ISO-BMFF box walk
    * ([[graft.functions.Mp4Meta]] over [[mp4Table]]'s real `moov`/`mvhd`
    * structure), so this is decode→sample end-to-end minus only the pixel
    * codec. Timestamps are exact integer arithmetic in both movie ticks
    * and milliseconds: frame i of k=8 samples at
    * `ts_ticks = (2i+1)·duration DIV 16`, engine-reproducible.
    *
    * Shape at 100 TB: one narrow projection + a k-row `explode` per video
    * (no shuffle, no UDF); the emitted (doc_id, ts) list is exactly the
    * fetch plan a downstream GPU decode stage consumes.
    */
  def qMultimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    val packed = graft.functions.Mp4Meta(col("content"))
    mp4Table(spark, dir)
      .select(col("doc_id"),
        shiftrightunsigned(packed, 32).as("timescale"),
        packed.bitwiseAND(lit(0xFFFFFFFFL)).as("duration"))
      .select(col("doc_id"), col("timescale"), col("duration"),
        explode(sequence(lit(0L), lit(7L))).as("frame_idx"))
      .withColumn("ts_ticks", expr("(2 * frame_idx + 1) * duration DIV 16"))
      .withColumn("ts_ms", expr("ts_ticks * 1000 DIV timescale"))
      .select(col("doc_id"), col("frame_idx"), col("timescale"), col("duration"),
        col("ts_ticks"), col("ts_ms"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val qMultimodalFramesSql: String =
    """SELECT d.doc_id, f.frame_idx,
      |  CAST(600 + (d.doc_id % 10) * 100 AS BIGINT) AS timescale,
      |  CAST((d.doc_id % 3600 + 1) * (600 + (d.doc_id % 10) * 100) AS BIGINT) AS duration,
      |  CAST((2 * f.frame_idx + 1) * ((d.doc_id % 3600 + 1) * (600 + (d.doc_id % 10) * 100)) // 16 AS BIGINT) AS ts_ticks,
      |  CAST(((2 * f.frame_idx + 1) * ((d.doc_id % 3600 + 1) * (600 + (d.doc_id % 10) * 100)) // 16) * 1000
      |    // (600 + (d.doc_id % 10) * 100) AS BIGINT) AS ts_ms
      |FROM documents d CROSS JOIN range(8) f(frame_idx)
      |WHERE d.doc_id % 3 = 2
      |ORDER BY d.doc_id, f.frame_idx""".stripMargin

  /** JPEG rows carrying a REAL EXIF APP1 segment: a complete TIFF
    * structure (byte-order header, magic 42, IFD0) whose byte order
    * ALTERNATES per row — `II` little-endian for even doc_ids, `MM`
    * big-endian for odd — and whose IFD0 leads with an unrelated ASCII
    * `Make` entry (offset-valued) so a correct parse must honor the
    * declared endianness and SCAN entries rather than read a fixed slot.
    * Orientation (tag 0x0112) is the pure doc_id function `doc_id%8+1`,
    * covering all 8 flip/rotate states; the document text rides behind a
    * minimal SOF0 as payload.
    */
  def exifTable(spark: SparkSession, dir: String): DataFrame = {
    val orient = (col("doc_id") % 8 + 1).cast("long")
    // TIFF block: hdr(8) + count(2) + 2 entries(24) + next(4) = 38;
    // the Make string ("GRAFT\0", 6 bytes) sits at offset 38 → APP1
    // length = 2 + 6 + 44 = 52 = 0x0034
    val tiffLe = concat(
      lit("49492A0008000000"), // II, 42, IFD0 @ 8
      lit("0200"), // 2 entries
      lit("0F01"), lit("0200"), lit("06000000"), lit("26000000"), // Make ASCII(6) @ 38
      lit("1201"), lit("0300"), lit("01000000"),
      concat(lpad(hex(orient), 2, "0"), lit("000000")), // SHORT left-justified LE
      lit("00000000"), // next IFD
      lit("475241465400")) // "GRAFT\0"
    val tiffBe = concat(
      lit("4D4D002A00000008"), // MM, 42, IFD0 @ 8
      lit("0002"),
      lit("010F"), lit("0002"), lit("00000006"), lit("00000026"),
      lit("0112"), lit("0003"), lit("00000001"),
      concat(lit("00"), lpad(hex(orient), 2, "0"), lit("0000")), // SHORT left-justified BE
      lit("00000000"),
      lit("475241465400"))
    val w = (col("doc_id") % 509 + 16).cast("long")
    val h = ((col("doc_id") * 3) % 479 + 16).cast("long")
    val jpegHex = concat(
      lit("FFD8"), // SOI
      lit("FFE10034457869660000"), // APP1, len 52, "Exif\0\0"
      when(col("doc_id") % 2 === 0, tiffLe).otherwise(tiffBe),
      lit("FFC0001108"), lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"), // SOF0
      lit("03011100021101031101"))
    table(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"),
        unhex(concat(jpegHex, hex(encode(col("text"), "UTF-8")))).as("content"))
  }

  /** EXIF orientation decode — the rotate-before-resize input of the
    * image-prep path: parse tag 0x0112 out of the APP1 TIFF structure
    * with the codegen [[graft.functions.ExifOrient]] expression, honoring
    * the per-row byte order. As with [[qMultimodalDims]], the oracle
    * derives byte order and orientation INDEPENDENTLY from doc_id
    * arithmetic, so the hash match proves the dual-endianness IFD walk on
    * every row. One narrow projection, no shuffle before the sort.
    */
  def qMultimodalExif(spark: SparkSession, dir: String): DataFrame = {
    val packed = graft.functions.ExifOrient(col("content"))
    exifTable(spark, dir)
      .select(col("doc_id"),
        when(shiftrightunsigned(packed, 16) === 0L, "II").otherwise("MM")
          .as("byte_order"),
        packed.bitwiseAND(lit(0xFFFFL)).as("orientation"))
      .orderBy(col("doc_id"))
  }

  val qMultimodalExifSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
      |  CAST(doc_id % 8 + 1 AS BIGINT) AS orientation
      |FROM documents
      |WHERE doc_id % 3 = 0
      |ORDER BY doc_id""".stripMargin

  // ---- EXIF metadata fixture (DateTime + GPS sub-IFD) -------------------

  /** Constant u16/u32 hex in the row's byte order (fixture builder). */
  private def hx16(v: Int, le: Boolean): String = {
    val s = f"$v%04X"
    if (le) s.substring(2) + s.substring(0, 2) else s
  }
  private def hx32(v: Long, le: Boolean): String = {
    val s = f"$v%08X"
    if (le) s.substring(6) + s.substring(4, 6) + s.substring(2, 4) + s.substring(0, 2)
    else s
  }
  /** A full constant IFD entry: tag, type, count, value/offset. */
  private def ifdEntry(le: Boolean, tag: Int, typ: Int, cnt: Long, v: Long): String =
    hx16(tag, le) + hx16(typ, le) + hx32(cnt, le) + hx32(v, le)
  /** Column-valued u32 hex in the row's byte order. */
  private def u32Hex(v: Column, le: Boolean): Column = {
    val be = lpad(hex(v), 8, "0")
    if (!le) be
    else concat(substring(be, 7, 2), substring(be, 5, 2),
      substring(be, 3, 2), substring(be, 1, 2))
  }

  /** JPEG rows carrying the FULL EXIF metadata structure the deep walks
    * parse — IFD0 (Make @offset, Orientation inline, DateTime ASCII(20)
    * @offset, GPS-IFD POINTER) plus the GPS **sub-IFD** (lat/lon refs
    * inline, lat/lon as offset-valued RATIONAL×3 — six u32 (num, den)
    * pairs each), byte order alternating `II`/`MM` per row as in
    * [[exifTable]]. Layout (TIFF-relative): IFD0@8 (4 entries), GPS
    * IFD@62 (4 entries), Make@116, DateTime@122, lat rationals@142, lon
    * rationals@166, total 190 bytes → APP1 length 198. Every field is a
    * pure doc_id function (second rationals carry den = 100 so the
    * micro-arcsecond DIV is exact), so the oracle replays the decode
    * from arithmetic alone.
    */
  def exifMetaTable(spark: SparkSession, dir: String): DataFrame = {
    val orient = (col("doc_id") % 8 + 1).cast("long")
    val dtStr = format_string("%04d:%02d:%02d %02d:%02d:%02d",
      col("doc_id") % 26 + 2000, col("doc_id") % 12 + 1, col("doc_id") % 28 + 1,
      col("doc_id") % 24, col("doc_id") % 60, (col("doc_id") * 7) % 60)
    val dtHex = concat(hex(encode(dtStr, "UTF-8")), lit("00"))
    val latRefHex = when(expr("(doc_id DIV 3) % 2 = 1"), lit("53")) // 'S'
      .otherwise(lit("4E")) // 'N'
    val lonRefHex = when(expr("(doc_id DIV 5) % 2 = 1"), lit("57")) // 'W'
      .otherwise(lit("45")) // 'E'
    def rats(le: Boolean): Column = concat(
      u32Hex((col("doc_id") % 90).cast("long"), le), hx32c(1L, le),
      u32Hex((col("doc_id") % 60).cast("long"), le), hx32c(1L, le),
      u32Hex(((col("doc_id") * 13) % 6000).cast("long"), le), hx32c(100L, le),
      u32Hex((col("doc_id") % 180).cast("long"), le), hx32c(1L, le),
      u32Hex(((col("doc_id") * 3) % 60).cast("long"), le), hx32c(1L, le),
      u32Hex(((col("doc_id") * 17) % 6000).cast("long"), le), hx32c(100L, le))
    def tiff(le: Boolean): Column = {
      val orientVal =
        if (le) concat(lpad(hex(orient), 2, "0"), lit("000000"))
        else concat(lit("00"), lpad(hex(orient), 2, "0"), lit("0000"))
      concat(
        lit(if (le) "49492A0008000000" else "4D4D002A00000008"),
        lit(hx16(4, le)), // IFD0: 4 entries
        lit(ifdEntry(le, 0x010F, 2, 6, 116)), // Make ASCII(6) @116
        lit(hx16(0x0112, le) + hx16(3, le) + hx32(1, le)), orientVal,
        lit(ifdEntry(le, 0x0132, 2, 20, 122)), // DateTime ASCII(20) @122
        lit(ifdEntry(le, 0x8825, 4, 1, 62)), // GPS IFD pointer → 62
        lit("00000000"), // IFD0 next
        lit(hx16(4, le)), // GPS IFD: 4 entries
        lit(hx16(1, le) + hx16(2, le) + hx32(2, le)), latRefHex, lit("000000"),
        lit(ifdEntry(le, 0x0002, 5, 3, 142)), // GPSLatitude RATIONAL×3 @142
        lit(hx16(3, le) + hx16(2, le) + hx32(2, le)), lonRefHex, lit("000000"),
        lit(ifdEntry(le, 0x0004, 5, 3, 166)), // GPSLongitude RATIONAL×3 @166
        lit("00000000"), // GPS IFD next
        lit("475241465400"), // "GRAFT\0" @116
        dtHex, // @122
        rats(le)) // @142 (lat), @166 (lon)
    }
    val w = (col("doc_id") % 509 + 16).cast("long")
    val h = ((col("doc_id") * 3) % 479 + 16).cast("long")
    val jpegHex = concat(
      lit("FFD8"), // SOI
      lit("FFE100C6457869660000"), // APP1, len 198, "Exif\0\0"
      when(col("doc_id") % 2 === 0, tiff(le = true)).otherwise(tiff(le = false)),
      lit("FFC0001108"), lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"), // SOF0
      lit("03011100021101031101"))
    table(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"),
        unhex(concat(jpegHex, hex(encode(col("text"), "UTF-8")))).as("content"))
  }

  private def hx32c(v: Long, le: Boolean): Column = lit(hx32(v, le))

  /** EXIF capture-time + GPS decode — the geo/time columns an image
    * ingest keys dedup windows and geo-bucketing on, parsed end-to-end
    * out of the APP1 bytes: [[graft.functions.ExifDateTime]] (the
    * offset-valued ASCII(20) walk) packed as `yyyymmddHHMMSS`,
    * [[graft.functions.ExifGps]] (IFD0 → GPS sub-IFD pointer →
    * ref-signed offset-valued RATIONAL×3) in exact signed
    * micro-arcseconds, plus [[graft.functions.ExifOrient]] over the SAME
    * richer IFD0 (the inline-SHORT walk must skip the offset-valued
    * entries around it). The oracle derives all four columns
    * independently from doc_id arithmetic, so the hash match proves the
    * dual-endianness multi-IFD walk on every row. One narrow codegen
    * projection, no shuffle before the sort.
    */
  def qMultimodalExifMeta(spark: SparkSession, dir: String): DataFrame = {
    val packed = graft.functions.ExifOrient(col("content"))
    exifMetaTable(spark, dir)
      .select(col("doc_id"),
        graft.functions.ExifMeta.dateTime(col("content")).as("dt_packed"),
        graft.functions.ExifMeta.gpsLat(col("content")).as("lat_uas"),
        graft.functions.ExifMeta.gpsLon(col("content")).as("lon_uas"),
        packed.bitwiseAND(lit(0xFFFFL)).as("orientation"))
      .orderBy(col("doc_id"))
  }

  val qMultimodalExifMetaSql: String =
    """SELECT doc_id,
      |  CAST((2000 + doc_id % 26) * 10000000000 + (doc_id % 12 + 1) * 100000000
      |    + (doc_id % 28 + 1) * 1000000 + (doc_id % 24) * 10000
      |    + (doc_id % 60) * 100 + (doc_id * 7) % 60 AS BIGINT) AS dt_packed,
      |  CAST((CASE WHEN (doc_id // 3) % 2 = 1 THEN -1 ELSE 1 END) *
      |    ((doc_id % 90) * 3600000000 + (doc_id % 60) * 60000000
      |     + ((doc_id * 13) % 6000) * 10000) AS BIGINT) AS lat_uas,
      |  CAST((CASE WHEN (doc_id // 5) % 2 = 1 THEN -1 ELSE 1 END) *
      |    ((doc_id % 180) * 3600000000 + ((doc_id * 3) % 60) * 60000000
      |     + ((doc_id * 17) % 6000) * 10000) AS BIGINT) AS lon_uas,
      |  CAST(doc_id % 8 + 1 AS BIGINT) AS orientation
      |FROM documents
      |WHERE doc_id % 3 = 1
      |ORDER BY doc_id""".stripMargin

  /** `(doc_id, lat_cell, lon_cell, hour)` decoded from photo bytes — the
    * ONE place the burst key formula lives, shared by the batch audit and
    * the streaming ingest gate ([[graft.streaming.ExifIngestStream]]) so
    * the cell/hour discipline cannot diverge between them. Rows whose
    * payload does not decode OR decodes to an out-of-range coordinate
    * (|lat| > 90°, |lon| > 180° — values [[graft.functions.ExifGps]]'s
    * u31 bound admits but no valid GPS IFD produces) are DROPPED — the
    * gate's quarantine path, not its dedup path. The range guard also
    * keeps the shifted cell value non-negative, where integer DIV is
    * floor in BOTH engines (Spark DIV truncates toward zero, DuckDB `//`
    * floors — they only agree above zero).
    *
    * The time key is INTENTIONALLY hour-of-day (`dt DIV 10000 % 100`),
    * not the full date-hour (ADVICE r13): burst dedup bins by capture
    * clock-hour within a cell — a recurring-capture-context rule (same
    * place, same time of day ⇒ same shot series, e.g. a webcam or
    * timelapse rig) rather than a single-session rule. Batch audit,
    * streaming gate, and oracle all share this formula, so the choice is
    * one line to change if a deployment wants single-session semantics
    * (`dt DIV 10000`).
    */
  def burstKeys(photos: DataFrame): DataFrame =
    photos
      .select(col("doc_id"),
        graft.functions.ExifMeta.dateTime(col("content")).as("dt"),
        graft.functions.ExifMeta.gpsLat(col("content")).as("lat"),
        graft.functions.ExifMeta.gpsLon(col("content")).as("lon"))
      .filter(col("dt").isNotNull &&
        abs(col("lat")) <= lit(324000000000L) &&
        abs(col("lon")) <= lit(648000000000L))
      .select(col("doc_id"),
        expr("(lat + 324000000000) DIV 36000000000").as("lat_cell"),
        expr("(lon + 648000000000) DIV 36000000000").as("lon_cell"),
        expr("dt DIV 10000 % 100").as("hour"))

  /** BURST dedup over decoded EXIF metadata — the image-corpus duplicate
    * pattern no text fingerprint catches: a camera firing N shots of the
    * same scene produces pixel-distinct files whose CAPTURE CONTEXT
    * coincides, so image pipelines dedup on (place, time) cells before
    * any expensive visual hash. Groups photos by 10°-geo-cell + capture
    * hour — every key decoded FROM THE BYTES by the [[burstKeys]]
    * formula over [[exifMetaTable]] — and emits only the collision
    * groups with their min-id survivor and the duplicate count the
    * dedup would drop.
    *
    * Shape at 100 TB: one narrow codegen projection (three byte walks,
    * no decode) → one map-side-combinable hash aggregate on the cell
    * key → count filter; group cardinality is bounded by cells×hours,
    * never by photo pairs.
    */
  def qExifBurstDedup(spark: SparkSession, dir: String): DataFrame =
    burstKeys(exifMetaTable(spark, dir))
      .groupBy(col("lat_cell"), col("lon_cell"), col("hour"))
      .agg(count(lit(1)).as("n_photos"),
        min(col("doc_id")).as("survivor"),
        (count(lit(1)) - 1).as("n_dropped"))
      .filter(col("n_photos") >= 2)
      .orderBy(col("lat_cell"), col("lon_cell"), col("hour"))

  val qExifBurstDedupSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    (2000 + doc_id % 26) * 10000000000 + (doc_id % 12 + 1) * 100000000
      |      + (doc_id % 28 + 1) * 1000000 + (doc_id % 24) * 10000
      |      + (doc_id % 60) * 100 + (doc_id * 7) % 60 AS dt,
      |    (CASE WHEN (doc_id // 3) % 2 = 1 THEN -1 ELSE 1 END) *
      |      ((doc_id % 90) * 3600000000 + (doc_id % 60) * 60000000
      |       + ((doc_id * 13) % 6000) * 10000) AS lat,
      |    (CASE WHEN (doc_id // 5) % 2 = 1 THEN -1 ELSE 1 END) *
      |      ((doc_id % 180) * 3600000000 + ((doc_id * 3) % 60) * 60000000
      |       + ((doc_id * 17) % 6000) * 10000) AS lon
      |  FROM documents WHERE doc_id % 3 = 1
      |)
      |SELECT CAST((lat + 324000000000) // 36000000000 AS BIGINT) AS lat_cell,
      |  CAST((lon + 648000000000) // 36000000000 AS BIGINT) AS lon_cell,
      |  CAST(dt // 10000 % 100 AS BIGINT) AS hour,
      |  CAST(count(*) AS BIGINT) AS n_photos,
      |  min(doc_id) AS survivor,
      |  CAST(count(*) - 1 AS BIGINT) AS n_dropped
      |FROM m GROUP BY 1, 2, 3 HAVING count(*) >= 2
      |ORDER BY 1, 2, 3""".stripMargin

  /** JPEG rows carrying an IFD0 → IFD1 (thumbnail) chain — the fixture
    * for [[graft.functions.ExifThumb]]'s next-IFD walk. Layout
    * (TIFF-relative): IFD0@8 (1 entry: inline Orientation; next-IFD
    * pointer → 26), IFD1@26 (3 entries: Compression SHORT inline,
    * JPEGInterchangeFormat LONG = 68 + pad, JPEGInterchangeFormatLength
    * LONG; next 0), `pad = doc_id % 8` zero bytes, then the thumbnail
    * bytes themselves (`len = doc_id % 32 + 4`). Byte order alternates
    * `II`/`MM` per row; every field is a pure doc_id function so the
    * oracle replays the decode from arithmetic alone — offset, length
    * AND compression all vary per row.
    */
  def exifThumbTable(spark: SparkSession, dir: String): DataFrame = {
    val orient = (col("doc_id") % 8 + 1).cast("long")
    val comp = when(col("doc_id") % 4 === 0, 1L).otherwise(6L)
    val pad = (col("doc_id") % 8).cast("long")
    val l = (col("doc_id") % 32 + 4).cast("long")
    def tiff(le: Boolean): Column = {
      val orientVal =
        if (le) concat(lpad(hex(orient), 2, "0"), lit("000000"))
        else concat(lit("00"), lpad(hex(orient), 2, "0"), lit("0000"))
      val compVal =
        if (le) concat(lpad(hex(comp), 2, "0"), lit("000000"))
        else concat(lit("00"), lpad(hex(comp), 2, "0"), lit("0000"))
      concat(
        lit(if (le) "49492A0008000000" else "4D4D002A00000008"),
        lit(hx16(1, le)), // IFD0: 1 entry
        lit(hx16(0x0112, le) + hx16(3, le) + hx32(1, le)), orientVal,
        lit(hx32(26, le)), // IFD0 next → IFD1 @26
        lit(hx16(3, le)), // IFD1: 3 entries
        lit(hx16(0x0103, le) + hx16(3, le) + hx32(1, le)), compVal,
        lit(hx16(0x0201, le) + hx16(4, le) + hx32(1, le)), u32Hex(lit(68L) + pad, le),
        lit(hx16(0x0202, le) + hx16(4, le) + hx32(1, le)), u32Hex(l, le),
        lit("00000000"), // IFD1 next
        expr("repeat('00', CAST(doc_id % 8 AS INT))"), // pad before thumb
        expr("repeat('A5', CAST(doc_id % 32 + 4 AS INT))")) // thumbnail bytes
    }
    val jpegHex = concat(
      lit("FFD8"), // SOI
      lit("FFE1"), lpad(hex(lit(76L) + pad + l), 4, "0"), lit("457869660000"),
      when(col("doc_id") % 2 === 0, tiff(le = true)).otherwise(tiff(le = false)))
    table(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"),
        unhex(concat(jpegHex, hex(encode(col("text"), "UTF-8")))).as("content"))
  }

  /** EXIF thumbnail decode (VERDICT r13 item 7) — the IFD1 chain walk
    * over [[exifThumbTable]]: compression, byte offset and length of the
    * embedded preview unpacked from [[graft.functions.ExifThumb]]'s one
    * codegen walk, plus IFD0's orientation off the SAME payload (the
    * next-IFD pointer must not disturb the IFD0 scan). Oracle replays
    * all four columns from doc_id arithmetic. One narrow codegen
    * projection, no shuffle before the sort.
    */
  def qMultimodalExifThumb(spark: SparkSession, dir: String): DataFrame = {
    val packed = graft.functions.ExifMeta.thumb(col("content"))
    val orient = graft.functions.ExifOrient(col("content"))
    exifThumbTable(spark, dir)
      .select(col("doc_id"),
        shiftrightunsigned(packed, 48).as("thumb_comp"),
        shiftrightunsigned(packed, 24).bitwiseAND(lit(0xFFFFFFL)).as("thumb_off"),
        packed.bitwiseAND(lit(0xFFFFFFL)).as("thumb_len"),
        orient.bitwiseAND(lit(0xFFFFL)).as("orientation"))
      .orderBy(col("doc_id"))
  }

  val qMultimodalExifThumbSql: String =
    """SELECT doc_id,
      |  CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 6 END AS BIGINT) AS thumb_comp,
      |  CAST(68 + doc_id % 8 AS BIGINT) AS thumb_off,
      |  CAST(doc_id % 32 + 4 AS BIGINT) AS thumb_len,
      |  CAST(doc_id % 8 + 1 AS BIGINT) AS orientation
      |FROM documents
      |WHERE doc_id % 3 = 2
      |ORDER BY doc_id""".stripMargin

  /** Thumbnail EXTRACTION — serve the embedded preview bytes the IFD1
    * walk located: slice `content` at the decoded (offset, length) and
    * emit the served slice as hex plus its length, proving the
    * locate→fetch path end-to-end (the browse/triage serving plan that
    * never decodes the full-resolution image). Offset is TIFF-relative;
    * the TIFF block starts at payload byte 12 (SOI 2 + APP1 marker 2 +
    * length field 2 + `Exif\0\0` 6), so the 1-based slice position is
    * `13 + off`. One narrow codegen projection — the full payload never
    * shuffles; only the u24-bounded preview slice feeds the output.
    */
  def qExifThumbBytes(spark: SparkSession, dir: String): DataFrame = {
    val packed = graft.functions.ExifMeta.thumb(col("content"))
    exifThumbTable(spark, dir)
      .select(col("doc_id"), col("content"), packed.as("p"))
      .select(col("doc_id"),
        col("p").bitwiseAND(lit(0xFFFFFFL)).as("thumb_len"),
        hex(expr("substring(content, CAST(13 + ((p >> 24) & 16777215) AS INT), " +
          "CAST(p & 16777215 AS INT))")).as("thumb_hex"))
      .orderBy(col("doc_id"))
  }

  val qExifThumbBytesSql: String =
    """SELECT doc_id, CAST(doc_id % 32 + 4 AS BIGINT) AS thumb_len,
      |  repeat('A5', CAST(doc_id % 32 + 4 AS INT)) AS thumb_hex
      |FROM documents WHERE doc_id % 3 = 2
      |ORDER BY doc_id""".stripMargin

  /** GEO-DIVERSITY temperature mix over the EXIF cells (VERDICT r13
    * item 4) — the multimodal dual of [[Corpus.qSampleTemperature]]: a
    * photo corpus is rebalanced by GEOGRAPHY the way text is by source.
    * Cells are [[burstKeys]]'s 10° geo-cells decoded straight from the
    * EXIF bytes; keep rates are the α = ½ temperature rule normalized so
    * the SMALLEST cell keeps 100 % (`thr = floor(10⁴·√(n_min/n_cell))`
    * — one IEEE division + correctly-rounded sqrt, bit-identical across
    * engines); the keep decision is the suite's md5-bucket row function,
    * so the realized sample is repartition-invariant and reproducible.
    * Output per cell: photo count, threshold, kept count and mass.
    *
    * Shape at 100 TB: cell sizes are a (≤ 18×36 cells)-sized aggregate
    * broadcast back to the scan; photos are filtered map-side; the
    * decode is the same narrow codegen walk the burst gate pays — no
    * shuffle wider than the cells relation anywhere.
    */
  def qGeoDiversityMix(spark: SparkSession, dir: String): DataFrame = {
    val keys = burstKeys(exifMetaTable(spark, dir))
    keys.join(broadcast(cellRates(keys)), Seq("lat_cell", "lon_cell"))
      .filter(keepBucket(col("doc_id")) < col("thr"))
      .groupBy(col("lat_cell"), col("lon_cell"))
      .agg(max(col("n_cell")).as("n_photos"), max(col("thr")).as("thr"),
        count(lit(1)).as("n_kept"))
      .orderBy(col("lat_cell"), col("lon_cell"))
  }

  /** The per-cell temperature keep thresholds over decoded [[burstKeys]]
    * rows — the ONE place the geo-rate formula lives, shared by the
    * batch mix above and the streaming admission gate
    * ([[graft.streaming.GeoSampleStream]]) so the two cannot diverge:
    * `(lat_cell, lon_cell, n_cell, thr)` with
    * `thr = floor(10⁴·√(n_min/n_cell))`.
    */
  def cellRates(keys: DataFrame): DataFrame = {
    val cells = keys.groupBy(col("lat_cell"), col("lon_cell"))
      .agg(count(lit(1)).as("n_cell"))
    val minN = cells.agg(min(col("n_cell")).as("n_min"))
    cells.crossJoin(broadcast(minN))
      .select(col("lat_cell"), col("lon_cell"), col("n_cell"),
        floor(lit(10000d) *
          sqrt(col("n_min").cast("double") / col("n_cell").cast("double")))
          .as("thr"))
  }

  /** The suite's md5-bucket keep decision for a doc id (pure row
    * function — repartition-invariant, reproducible).
    */
  def keepBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(10000))

  val qGeoDiversityMixSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    (2000 + doc_id % 26) * 10000000000 + (doc_id % 12 + 1) * 100000000
      |      + (doc_id % 28 + 1) * 1000000 + (doc_id % 24) * 10000
      |      + (doc_id % 60) * 100 + (doc_id * 7) % 60 AS dt,
      |    (CASE WHEN (doc_id // 3) % 2 = 1 THEN -1 ELSE 1 END) *
      |      ((doc_id % 90) * 3600000000 + (doc_id % 60) * 60000000
      |       + ((doc_id * 13) % 6000) * 10000) AS lat,
      |    (CASE WHEN (doc_id // 5) % 2 = 1 THEN -1 ELSE 1 END) *
      |      ((doc_id % 180) * 3600000000 + ((doc_id * 3) % 60) * 60000000
      |       + ((doc_id * 17) % 6000) * 10000) AS lon
      |  FROM documents WHERE doc_id % 3 = 1
      |), k AS (
      |  SELECT doc_id,
      |    (lat + 324000000000) // 36000000000 AS lat_cell,
      |    (lon + 648000000000) // 36000000000 AS lon_cell
      |  FROM m
      |), cells AS (
      |  SELECT lat_cell, lon_cell, count(*) AS n_cell FROM k GROUP BY 1, 2
      |), mn AS (SELECT min(n_cell) AS n_min FROM cells),
      |rates AS (
      |  SELECT lat_cell, lon_cell, n_cell,
      |    CAST(floor(10000 * sqrt(CAST(n_min AS DOUBLE) / CAST(n_cell AS DOUBLE))) AS BIGINT) AS thr
      |  FROM cells, mn
      |)
      |SELECT k.lat_cell, k.lon_cell, max(r.n_cell) AS n_photos,
      |  max(r.thr) AS thr, CAST(count(*) AS BIGINT) AS n_kept
      |FROM k JOIN rates r ON r.lat_cell = k.lat_cell AND r.lon_cell = k.lon_cell
      |WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |    % 10000 < r.thr
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Uniform temporal AUDIO sampling — the audio dual of
    * [[qMultimodalFrames]], completing the media-prep family: split each
    * clip into k=8 equal segments and emit each segment's CENTER as an
    * exact SAMPLE INDEX (the TSN center-sampling discipline applied to
    * waveforms — what a speech/audio pretraining stack feeds its encoder
    * windows). The clip extent is NOT metadata handed in: sample count =
    * `data_len DIV blockAlign` where `data_len` comes out of the actual
    * RIFF chunk walk ([[graft.functions.WavDataLen]] over [[wavTable]]'s
    * real LIST/fmt/data structure) and blockAlign out of the `fmt `
    * fields ([[graft.functions.WavMeta]]) — decode→sample end-to-end
    * minus only the PCM codec. Each center carries its byte offset
    * (`sample_idx · blockAlign` — the exact fetch plan a downstream
    * decode stage seeks to) and its timestamp in exact integer
    * microseconds (`sample_idx · 10⁶ DIV rate`).
    *
    * Shape at 100 TB: one narrow projection + a k-row `explode` per clip
    * (no shuffle, no UDF); both walkers are codegen byte walks computed
    * ONCE per clip BEFORE the explode (GenerateExec re-evaluates outer
    * projections per generated row).
    */
  def qMultimodalAudioFrames(spark: SparkSession, dir: String): DataFrame = {
    val packed = graft.functions.WavMeta(col("content"))
    wavTable(spark, dir)
      .select(col("doc_id"),
        shiftrightunsigned(packed, 32).as("sample_rate"),
        shiftrightunsigned(packed, 16).bitwiseAND(lit(0xFFFFL)).as("channels"),
        packed.bitwiseAND(lit(0xFFFFL)).as("bits_per_sample"),
        graft.functions.WavDataLen(col("content")).as("data_len"))
      .withColumn("block_align", expr("channels * (bits_per_sample DIV 8)"))
      .withColumn("n_samples", expr("data_len DIV block_align"))
      .select(col("doc_id"), col("sample_rate"), col("block_align"),
        col("n_samples"), explode(sequence(lit(0L), lit(7L))).as("frame_idx"))
      .withColumn("sample_idx", expr("(2 * frame_idx + 1) * n_samples DIV 16"))
      .withColumn("byte_off", expr("sample_idx * block_align"))
      .withColumn("ts_us", expr("sample_idx * 1000000 DIV sample_rate"))
      .select(col("doc_id"), col("frame_idx"), col("sample_rate"),
        col("n_samples"), col("sample_idx"), col("byte_off"), col("ts_us"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val qMultimodalAudioFramesSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |    CAST(8000 + (doc_id % 40) * 1000 AS BIGINT) AS sample_rate,
      |    CAST((doc_id % 2 + 1) * (doc_id % 3 + 1) AS BIGINT) AS block_align,
      |    CAST(octet_length(encode(text))
      |      // ((doc_id % 2 + 1) * (doc_id % 3 + 1)) AS BIGINT) AS n_samples
      |  FROM documents WHERE doc_id % 3 = 1
      |), s AS (
      |  SELECT doc_id, frame_idx, sample_rate, n_samples,
      |    CAST((2 * frame_idx + 1) * n_samples // 16 AS BIGINT) AS sample_idx,
      |    block_align
      |  FROM w CROSS JOIN range(8) f(frame_idx)
      |)
      |SELECT doc_id, frame_idx, sample_rate, n_samples, sample_idx,
      |  CAST(sample_idx * block_align AS BIGINT) AS byte_off,
      |  CAST(sample_idx * 1000000 // sample_rate AS BIGINT) AS ts_us
      |FROM s
      |ORDER BY doc_id, frame_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> (qMultimodalFeatures _),
    "q_multimodal_roundtrip" -> (qMultimodalRoundtrip _),
    "q_multimodal_sniff" -> (qMultimodalSniff _),
    "q_multimodal_dims" -> (qMultimodalDims _),
    "q_jpeg_quality" -> (qJpegQuality _),
    "q_multimodal_wav" -> (qMultimodalWav _),
    "q_multimodal_mp4" -> (qMultimodalMp4 _),
    "q_multimodal_resize" -> (qMultimodalResize _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_audio_frames" -> (qMultimodalAudioFrames _),
    "q_multimodal_exif" -> (qMultimodalExif _),
    "q_multimodal_exif_meta" -> (qMultimodalExifMeta _),
    "q_exif_burst_dedup" -> (qExifBurstDedup _),
    "q_geo_diversity_mix" -> (qGeoDiversityMix _),
    "q_multimodal_exif_thumb" -> (qMultimodalExifThumb _),
    "q_exif_thumb_bytes" -> (qExifThumbBytes _),
  )

  def oracle: Map[String, String] = Map(
    "q_multimodal_features" -> qMultimodalFeaturesSql,
    "q_multimodal_roundtrip" -> qMultimodalRoundtripSql,
    "q_multimodal_sniff" -> qMultimodalSniffSql,
    "q_multimodal_dims" -> qMultimodalDimsSql,
    "q_jpeg_quality" -> qJpegQualitySql,
    "q_multimodal_wav" -> qMultimodalWavSql,
    "q_multimodal_mp4" -> qMultimodalMp4Sql,
    "q_multimodal_resize" -> qMultimodalResizeSql,
    "q_multimodal_frames" -> qMultimodalFramesSql,
    "q_multimodal_audio_frames" -> qMultimodalAudioFramesSql,
    "q_multimodal_exif" -> qMultimodalExifSql,
    "q_multimodal_exif_meta" -> qMultimodalExifMetaSql,
    "q_exif_burst_dedup" -> qExifBurstDedupSql,
    "q_geo_diversity_mix" -> qGeoDiversityMixSql,
    "q_multimodal_exif_thumb" -> qMultimodalExifThumbSql,
    "q_exif_thumb_bytes" -> qExifThumbBytesSql,
  )
}
