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

  case class Ev(user_id: Long, typ: String, t_us: Long)
  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class StageRow(user_id: Long, stage: Long, t1: Long, t2: Long, t3: Long)

  def funnel(spark: SparkSession, events: DataFrame,
             windowUs: Long): Dataset[StageRow] = {
    import spark.implicits._

    def fn(uid: Long, batch: Iterator[Ev],
           state: GroupState[FunnelState]): StageRow = {
      var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
      batch.toArray.sortBy(_.t_us).foreach { e =>
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
      val stage = if (s.t3 >= 0) 3L else if (s.t2 >= 0) 2L
        else if (s.t1 >= 0) 1L else 0L
      StageRow(uid, stage, s.t1, s.t2, s.t3)
    }

    events.select(col("user_id"), col("event_type").as("typ"),
        col("t_us")).as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }
}
