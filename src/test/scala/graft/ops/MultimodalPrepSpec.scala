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
}
