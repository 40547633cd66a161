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
}
