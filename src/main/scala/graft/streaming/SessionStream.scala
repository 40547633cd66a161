package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming inter-event gap extraction — the stateful front half of the
  * session-gap sweep ([[graft.ops.Events.qSessionSweep]]): a TRUE
  * `flatMapGroupsWithState` operator keyed by user whose state is ONE
  * packed timestamp (the user's last event), so it survives driver
  * restarts exactly-once through checkpointing. Each arriving event emits
  * its gap to the previous event (null for the user's first) — the
  * identical (user_id, gap_us) relation the batch lag-window computes —
  * and [[graft.ops.Events.sessionSweepFrom]] turns the accumulated gaps
  * into the standing tuning curve.
  *
  * Stream == batch holds when per-user arrival order is event order (the
  * ingest contract every gap/funnel gate here shares): gaps are pure
  * functions of consecutive per-user events, so any trigger split that
  * preserves per-user order yields the identical gap multiset
  * (spec-pinned across three time-sliced commits).
  *
  * Scale: state is 16 bytes per active user; per batch each group sorts
  * only its own micro-batch slice.
  */
object SessionStream {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  final case class GapRow(user_id: Long, event_id: Long, gap_us: java.lang.Long)
  final case class LastSeen(us: Long, eid: Long)

  /** Epoch micros, exactly Spark's `unix_micros`: whole seconds from
    * getTime (floor for pre-epoch), fractional micros from getNanos.
    */
  private def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Per-event gap emission with one-timestamp-per-user state. */
  def gapAssignments(events: DataFrame): Dataset[GapRow] = {
    val sess = events.sparkSession
    import sess.implicits._
    events.select(col("user_id"), col("ts"), col("event_id")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[Ev],
            state: org.apache.spark.sql.streaming.GroupState[LastSeen]) => {
          var last = state.getOption
          val out = evs.toSeq
            .sortBy(e => (micros(e.ts), e.event_id))
            .map { e =>
              val us = micros(e.ts)
              val gap: java.lang.Long = last.map(l => us - l.us).map(Long.box).orNull
              last = Some(LastSeen(us, e.event_id))
              GapRow(uid, e.event_id, gap)
            }
          last.foreach(l => state.update(l))
          out.iterator
        })
  }
}
