package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming beaconing accumulator — the ingest-time shape of
  * `q_sec_beaconing`: per-key inter-arrival moment sums maintained in
  * `mapGroupsWithState` (O(1) state per key: last-seen timestamp plus the
  * three Long moment accumulators), so the periodicity readout is
  * continuously available instead of a per-snapshot window scan.
  *
  * Every emitted field is MONOTONE across batches (n, Σgap, Σgap² only
  * grow), so the landing compacts with a plain per-key max — the
  * StreamingFunnel no-batch-id discipline.
  *
  * STATE RETENTION: the key universe is unbounded at 100 TB ingest, so
  * the accumulator runs under `EventTimeTimeout` — a key idle past
  * `idleHorizonUs` (watermark advanced that far beyond its last arrival)
  * emits its final moment row once more (identical monotone values; the
  * max-compacting landing is unchanged) and drops its state. A key that
  * reappears later starts FRESH accumulators — the gap across the expiry
  * boundary is deliberately not counted: a source idle longer than the
  * horizon is by definition not beaconing within the detection window,
  * which is exactly why the horizon should be sized as a multiple of the
  * longest beacon period under watch (the fixture query's horizon exceeds
  * the topic span, so nothing expires mid-stream; the expiry path is
  * spec-pinned on a short-horizon fixture).
  *
  * Ordering contract as the funnel's: the topic delivers a key's events
  * in (event-time, event_id) order across batches (Kafka per-partition
  * ordering when keyed by user); within a batch the state function sorts.
  * Under that contract the accumulated gap multiset equals the batch
  * window's exactly, so the batch beaconing query IS the oracle.
  * Second-granularity gaps keep Σgap² inside Long for any realistic
  * per-key volume (documented in the batch operator).
  */
object StreamingBeacon {

  // ts mirrors t_us as a Timestamp: the watermark attribute must survive
  // into the state op's input (selecting it away fails the
  // UnsupportedOperationChecker for EventTimeTimeout)
  case class Ev(user_id: Long, t_us: Long, event_id: Long,
                ts: java.sql.Timestamp)
  // explicit seen-flag, NOT a -1 timestamp sentinel: a magic negative
  // `last` would conflate "no previous event" with valid pre-1970
  // timestamps and silently skip their gaps — the engine keeps
  // pre-epoch time in-discipline (see RangeJoin's exact floor division)
  case class BeaconState(seen: Boolean, last: Long, n: Long, sg: Long, sgg: Long)
  case class BeaconRow(user_id: Long, n_gaps: Long, sg: Long, sgg: Long)

  def gaps(spark: SparkSession, events: DataFrame, idleHorizonUs: Long,
           lateness: String = "0 seconds"): Dataset[BeaconRow] = {
    import spark.implicits._

    def fn(uid: Long, batch: Iterator[Ev],
           state: GroupState[BeaconState]): BeaconRow = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        BeaconRow(uid, s.n, s.sg, s.sgg)
      } else {
        var s = state.getOption.getOrElse(BeaconState(false, 0L, 0L, 0L, 0L))
        batch.toArray.sortBy(e => (e.t_us, e.event_id)).foreach { e =>
          if (s.seen) {
            val g = (e.t_us - s.last) / 1000000L
            s = BeaconState(seen = true, e.t_us, s.n + 1L, s.sg + g, s.sgg + g * g)
          } else s = s.copy(seen = true, last = e.t_us)
        }
        state.update(s)
        // idle-TTL anchored on the last arrival the state has seen; kept
        // above the current watermark (a batch can legally be all-late)
        state.setTimeoutTimestamp(math.max(
          state.getCurrentWatermarkMs() + 1,
          s.last / 1000L + idleHorizonUs / 1000L))
        BeaconRow(uid, s.n, s.sg, s.sgg)
      }
    }

    events.select(col("user_id"), col("t_us"), col("event_id"))
      .withColumn("ts", timestamp_micros(col("t_us")))
      .withWatermark("ts", lateness)
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
