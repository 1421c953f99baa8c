package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming time-bounded funnel — the ingest-time shape of
  * `q_funnel_timebound`, as a per-user stage machine in
  * `mapGroupsWithState` (SURVEY §2.7 superset: arbitrary business state,
  * not a built-in aggregation).
  *
  * State is three timestamps (signup, qualifying view, qualifying
  * purchase) — O(1) per user, set-once each (guarded by the unset
  * sentinel), so every emitted field is MONOTONE across batches: stage
  * only climbs, timestamps flip once from −1 to their final value. That
  * makes the landing compactable with a plain per-user max — the same
  * no-batch-id discipline as the streamed sketch registers.
  *
  * STATE RETENTION: per-key state is O(1), but the KEY UNIVERSE is not —
  * without a timeout the state store grows with the all-time distinct
  * users, unbounded at 100 TB ingest. The machine therefore runs under
  * `EventTimeTimeout`: a user idle past `idleHorizonUs` (no events while
  * the WATERMARK advances that far past their last arrival) is EXPIRED —
  * the final stage row is emitted one last time (identical values, so the
  * monotone-max landing is unchanged by the extra emission) and the state
  * row is dropped. A user who reappears after expiry starts a FRESH
  * funnel journey (their first post-expiry signup re-opens stage 1) —
  * that is the retention contract, not an accident: an analysis that
  * must treat a years-later signup as the same journey needs a horizon
  * that long. Callers size `idleHorizonUs` to the funnel's analysis
  * window (for the fixture query the analysis window is the whole topic,
  * so the horizon exceeds the topic span and nothing expires mid-stream;
  * the expiry path is spec-pinned on a short-horizon fixture).
  *
  * Ordering contract: stage transitions depend on event-time order, so
  * the topic must deliver a user's events in time order across batches —
  * exactly Kafka's per-partition ordering guarantee when the topic is
  * keyed by user. The test topic is written as time-ranged files landed
  * sequentially (increasing mtimes) so the file source honors it; within
  * a batch the state function sorts. Under that contract the machine
  * computes exactly the batch semantics (first qualifying event in time
  * order == the batch min over the window), so the batch funnel IS the
  * oracle.
  */
object StreamingFunnel {

  // ts mirrors t_us as a Timestamp: the watermark attribute must survive
  // into the state op's input (selecting it away fails the
  // UnsupportedOperationChecker for EventTimeTimeout)
  case class Ev(user_id: Long, typ: String, t_us: Long, ts: java.sql.Timestamp)
  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class StageRow(user_id: Long, stage: Long, t1: Long, t2: Long, t3: Long)

  def funnel(spark: SparkSession, events: DataFrame, windowUs: Long,
             idleHorizonUs: Long, lateness: String = "0 seconds")
      : Dataset[StageRow] = {
    import spark.implicits._

    // local (not an object method): the state closure must not capture
    // the enclosing non-serializable object
    def stageOf(s: FunnelState): Long =
      if (s.t3 >= 0) 3L else if (s.t2 >= 0) 2L else if (s.t1 >= 0) 1L else 0L

    def fn(uid: Long, batch: Iterator[Ev],
           state: GroupState[FunnelState]): StageRow = {
      if (state.hasTimedOut) {
        // emissions are already complete (every update was emitted in its
        // batch); re-emit the final monotone row and drop the state
        val s = state.get
        state.remove()
        StageRow(uid, stageOf(s), s.t1, s.t2, s.t3)
      } else {
        var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
        var lastUs = Long.MinValue
        batch.toArray.sortBy(_.t_us).foreach { e =>
          lastUs = math.max(lastUs, e.t_us)
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
        state.update(s)
        // idle-TTL: expire when the watermark passes the last arrival by
        // the horizon. Must stay above the current watermark or Spark
        // rejects the timestamp (a batch can legally be all-late).
        state.setTimeoutTimestamp(math.max(
          state.getCurrentWatermarkMs() + 1,
          lastUs / 1000L + idleHorizonUs / 1000L))
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
