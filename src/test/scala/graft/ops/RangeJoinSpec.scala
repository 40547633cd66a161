package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Bucketed interval join equals the naive range join. */
class RangeJoinSpec extends SparkFunSuite {

  test("pointInInterval matches the naive theta join") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
    // intervals: per-user sessions (start, last + 5 min)
    val sessions = ev
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("user_id").as("s_user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"))

    val bucketed = RangeJoin.pointInInterval(
      ev.select("event_id", "user_id", "ts"), sessions,
      pointTs = "ts", start = "s_start", end = "s_end",
      bucketSeconds = 300,
      pointKey = Some("user_id"), intervalKey = Some("s_user_id"))

    val naive = ev.select("event_id", "user_id", "ts")
      .join(sessions, col("user_id") === col("s_user_id") &&
        col("ts") >= col("s_start") && col("ts") < col("s_end"))

    assert(bucketed.count() == naive.count())
    // every event belongs to exactly one of its user's sessions
    assert(bucketed.count() == ev.count())
    val a = bucketed.select("event_id", "s_start").collect().map(r => (r.getLong(0), r.get(1))).toSet
    val b = naive.select("event_id", "s_start").collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(a == b)
  }

  test("intervalOverlap: hand-computed pairs, each counted exactly once") {
    import spark.implicits._
    // key 1: [0,10], [5,20], [15,30] — pairs (a,b) and (b,c) overlap,
    // (a,c) does not (10 < 15). [5,20] spans 3 buckets (size 10) and
    // overlaps both others: the first-shared-bucket dedup must emit each
    // pair ONCE despite multiple shared buckets. Key 2's [0,10] never
    // pairs across keys. Touching endpoints (closed intervals): [15,30]
    // vs [30,40] at key 1 overlap at the single day 30.
    val iv = Seq(
      (1L, 100L, 0L, 10L), (1L, 101L, 5L, 20L), (1L, 102L, 15L, 30L),
      (1L, 103L, 30L, 40L), (2L, 200L, 0L, 10L))
      .toDF("k", "id", "s", "e")
    val out = RangeJoin.intervalOverlap(iv, "k", "id", "s", "e", bucketSize = 10L)
      .select(col("k"), col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(out === Seq((1L, 100L, 101L), (1L, 101L, 102L), (1L, 102L, 103L)))
  }

  test("intervalOverlap matches the naive theta self-join on real intervals") {
    val sf = "/root/testdata/sf0.001"
    val ship = Tables.table(spark, sf, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(expr("datediff(l_shipdate, DATE '1970-01-01')")).as("e"))
    val iv = Tables.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("datediff(o_orderdate, DATE '1970-01-01')").as("s"))
      .join(ship, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("o_orderkey").as("okey"),
        col("s"), col("e"))
    val bucketed = RangeJoin.intervalOverlap(iv, "c", "okey", "s", "e", 30L)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val x = iv.toDF("c", "okey_a", "sa", "ea")
    val y = iv.toDF("c", "okey_b", "sb", "eb")
    val naive = x.join(y, Seq("c"))
      .filter(col("okey_a") < col("okey_b")
        && col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select(col("okey_a"), col("okey_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive && bucketed.nonEmpty)
  }

  test("intervalOverlap: seeded-random intervals equal the driver reference at several bucket sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // degenerate shapes on purpose: zero-length intervals, duplicates,
    // bucket-boundary endpoints
    val iv = (0 until 120).map { i =>
      val s = rnd.nextInt(100).toLong
      (rnd.nextInt(3).toLong, i.toLong, s, s + rnd.nextInt(30).toLong)
    }
    val expected = (for {
      a <- iv; b <- iv
      if a._1 == b._1 && a._2 < b._2 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._2, b._2)).toSet
    for (bucket <- Seq(1L, 7L, 64L)) {
      val got = RangeJoin.intervalOverlap(
        iv.toDF("k", "id", "s", "e"), "k", "id", "s", "e", bucket)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size === got.toSet.size, s"duplicate pairs at bucket=$bucket")
      assert(got.toSet === expected, s"pair set mismatch at bucket=$bucket")
    }
  }
}
