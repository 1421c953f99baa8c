package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization (SURVEY §2.7 superset): the
  * `flatMapGroupsWithState` form of [[graft.ops.Rollup.sessionize]] —
  * per-key session windows closed by event-time timeout, state bounded by
  * the watermark.
  *
  * Why custom state and not `session_window`: the built-in covers plain
  * gap-sessions; a custom state function is the extension point for
  * anything richer (per-session distinct counters, abandonment reasons,
  * capped session length). This implementation keeps exactly the built-in
  * semantics so the batch operator can oracle it, while exercising the
  * real state machinery: one state row per open (key) session, O(open
  * sessions) state, timeout at watermark past `last + gap`.
  *
  * Cross-batch disorder: an in-watermark event inside the open session's
  * gap envelope extends the session on either end. A late event that
  * belongs to an ALREADY-EMITTED session starts a new one instead (append
  * output cannot retract) — the one divergence from the batch operator,
  * bounded by the watermark.
  */
object StatefulSessionize {

  case class Event(user_id: Long, ts: Timestamp)
  case class SessionState(startUs: Long, lastUs: Long, n: Long)
  case class ClosedSession(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
                           n_events: Long)

  def sessionize(spark: SparkSession, events: DataFrame,
                 gapSeconds: Long, lateness: String = "1 hour"): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    // Timestamp.getTime is MILLIS — using it would silently truncate the
    // microsecond component and break exact batch parity; Spark's own
    // util converts Timestamp <-> micros losslessly.
    import org.apache.spark.sql.catalyst.util.DateTimeUtils

    def fn(userId: Long, batch: Iterator[Event],
           state: GroupState[SessionState]): Iterator[ClosedSession] = {
      def close(s: SessionState) = ClosedSession(userId,
        DateTimeUtils.toJavaTimestamp(s.startUs),
        DateTimeUtils.toJavaTimestamp(s.lastUs), s.n)

      if (state.hasTimedOut) {
        val out = state.getOption.map(close).iterator
        state.remove()
        out
      } else {
        // micro-batch arrival order is not time order: sort, then fold each
        // event into the open session, splitting at gaps
        val sorted = batch.map(e => DateTimeUtils.fromJavaTimestamp(e.ts)).toArray.sorted
        var open = state.getOption
        val closed = Vector.newBuilder[ClosedSession]
        sorted.foreach { tUs =>
          open match {
            // within gap of the open session's interval — including an
            // in-watermark event EARLIER than the open start (cross-batch
            // disorder): extend the interval on both ends
            case Some(s) if tUs >= s.startUs - gapUs && tUs <= s.lastUs + gapUs =>
              open = Some(SessionState(math.min(s.startUs, tUs),
                math.max(s.lastUs, tUs), s.n + 1))
            case Some(s) =>
              closed += close(s)
              open = Some(SessionState(tUs, tUs, 1))
            case None =>
              open = Some(SessionState(tUs, tUs, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastUs / 1000 + gapSeconds * 1000)
        }
        closed.result().iterator
      }
    }

    events.selectExpr("user_id", "ts").as[Event]
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
