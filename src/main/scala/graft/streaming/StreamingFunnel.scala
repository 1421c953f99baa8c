package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming time-bounded funnel — the ingest-time shape of
  * `q_funnel_timebound`, as a per-user stage machine in
  * `mapGroupsWithState` (SURVEY §2.7 superset: arbitrary business state,
  * not a built-in aggregation).
  *
  * Folded state is three timestamps (signup, qualifying view, qualifying
  * purchase) — O(1) per user, set-once each (guarded by the unset
  * sentinel), so every emitted field is MONOTONE across batches: stage
  * only climbs, timestamps flip once from −1 to their final value. That
  * makes the landing compactable with a plain per-user max — the same
  * no-batch-id discipline as the streamed sketch registers.
  *
  * REORDER TOLERANCE (r11): stage transitions depend on event-time
  * order, so arrivals BUFFER in state and fold only once the WATERMARK
  * passes them — any cross-batch reordering within the configured
  * `lateness` delay is exactly corrected (the fold replays the buffered
  * events in (t_us) order), so the machine computes the batch semantics
  * under the standard streaming contract: reorder tolerance = watermark
  * delay. An arrival BELOW the current watermark is beyond that
  * tolerance: Spark's stateful-operator late filter DROPS it before the
  * state function (the documented watermark contract, pinned in
  * StreamingReorderSpec) — under-sized tolerance loses the row VISIBLY
  * (its transition never happens), it can no longer mis-order the fold
  * as the pre-buffering machine could; the in-operator `require` is
  * defense-in-depth behind that filter. The per-user buffer is bounded
  * by the user's arrivals within one
  * watermark delay — a deployment knob, not corpus-scale state. A
  * buffered group arms a `watermark+1` timeout so the engine's no-data
  * batches (watermark advancement) flush the tail; with an in-order
  * topic and `lateness = 0` the buffer holds at most one batch.
  *
  * STATE RETENTION: `EventTimeTimeout` — a user idle past
  * `idleHorizonUs` (no events while the watermark advances that far
  * past their last arrival) is EXPIRED: the final stage row is emitted
  * one last time (identical values, so the monotone-max landing is
  * unchanged by the extra emission) and the state row is dropped. A
  * user who reappears after expiry starts a FRESH funnel journey —
  * that is the retention contract: an analysis that must treat a
  * years-later signup as the same journey needs a horizon that long.
  * Callers size `idleHorizonUs` to the funnel's analysis window (the
  * fixture query's horizon exceeds the topic span, so streamed ==
  * all-time batch funnel exactly; expiry is pinned in StreamingTtlSpec,
  * the reorder fold in StreamingReorderSpec).
  */
object StreamingFunnel {

  // ts mirrors t_us as a Timestamp: the watermark attribute must survive
  // into the state op's input (selecting it away fails the
  // UnsupportedOperationChecker for EventTimeTimeout)
  case class Ev(user_id: Long, typ: String, t_us: Long, ts: java.sql.Timestamp)
  case class Pend(t_us: Long, typ: String)
  case class FunnelState(t1: Long, t2: Long, t3: Long,
                         lastArr: Long, buf: Seq[Pend])
  case class StageRow(user_id: Long, stage: Long, t1: Long, t2: Long, t3: Long)

  def funnel(spark: SparkSession, events: DataFrame, windowUs: Long,
             idleHorizonUs: Long, lateness: String = "0 seconds")
      : Dataset[StageRow] = {
    import spark.implicits._

    // local (not object methods): the state closure must not capture
    // the enclosing non-serializable object
    def stageOf(s: FunnelState): Long =
      if (s.t3 >= 0) 3L else if (s.t2 >= 0) 2L else if (s.t1 >= 0) 1L else 0L

    // replay every buffered event the watermark has passed, in event-
    // time order (stable sort: equal-t events keep arrival order, the
    // single-batch tie rule)
    def foldReady(s0: FunnelState, wUs: Long): FunnelState = {
      val (ready, rest) = s0.buf.partition(_.t_us <= wUs)
      var s = s0.copy(buf = rest)
      ready.sortBy(_.t_us).foreach { e =>
        e.typ match {
          case "signup" if s.t1 < 0 =>
            s = s.copy(t1 = e.t_us)
          case "view" if s.t1 >= 0 && s.t2 < 0 &&
              e.t_us > s.t1 && e.t_us <= s.t1 + windowUs =>
            s = s.copy(t2 = e.t_us)
          case "purchase" if s.t2 >= 0 && s.t3 < 0 &&
              e.t_us > s.t2 && e.t_us <= s.t2 + windowUs =>
            s = s.copy(t3 = e.t_us)
          case _ =>
        }
      }
      s
    }

    def arm(state: GroupState[FunnelState], s: FunnelState, wMs: Long): Unit =
      state.setTimeoutTimestamp(
        if (s.buf.nonEmpty) wMs + 1 // flush on the next watermark advance
        else math.max(wMs + 1, s.lastArr / 1000L + idleHorizonUs / 1000L))

    def fn(uid: Long, batch: Iterator[Ev],
           state: GroupState[FunnelState]): StageRow = {
      val wMs = state.getCurrentWatermarkMs()
      val wUs = wMs * 1000L
      if (state.hasTimedOut) {
        val s = foldReady(state.get, wUs)
        if (s.lastArr / 1000L + idleHorizonUs / 1000L <= wMs) {
          // expiry: the buffer is empty by construction (every buffered
          // t <= lastArr < watermark at this point)
          state.remove()
        } else {
          state.update(s)
          arm(state, s, wMs)
        }
        StageRow(uid, stageOf(s), s.t1, s.t2, s.t3)
      } else {
        var s = state.getOption.getOrElse(
          FunnelState(-1L, -1L, -1L, Long.MinValue, Nil))
        val arrivals = batch.toArray
        arrivals.foreach { e =>
          require(wMs == 0 || e.t_us >= wUs,
            s"StreamingFunnel: event at t_us=${e.t_us} arrived below the " +
              s"watermark ($wUs) — beyond the configured reorder tolerance; " +
              "raise `lateness` or fix the topic's per-key ordering")
          s = s.copy(lastArr = math.max(s.lastArr, e.t_us),
            buf = s.buf :+ Pend(e.t_us, e.typ))
        }
        s = foldReady(s, wUs)
        state.update(s)
        arm(state, s, wMs)
        StageRow(uid, stageOf(s), s.t1, s.t2, s.t3)
      }
    }

    events.select(col("user_id"), col("event_type").as("typ"), col("t_us"))
      .withColumn("ts", timestamp_micros(col("t_us")))
      .withWatermark("ts", lateness)
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
