package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming beaconing accumulator — the ingest-time shape of
  * `q_sec_beaconing`: per-key inter-arrival moment sums maintained in
  * `mapGroupsWithState` (folded state is O(1) per key: last-seen
  * timestamp plus the three Long moment accumulators), so the
  * periodicity readout is continuously available instead of a
  * per-snapshot window scan.
  *
  * Every emitted field is MONOTONE across batches (n, Σgap, Σgap² only
  * grow), so the landing compacts with a plain per-key max — the
  * StreamingFunnel no-batch-id discipline.
  *
  * REORDER TOLERANCE (r11, the StreamingFunnel contract): gaps depend on
  * event-time adjacency, so arrivals BUFFER in state and fold only once
  * the watermark passes them, replayed in (t_us, event_id) order — any
  * reordering within the `lateness` delay is exactly corrected; an
  * arrival below the current watermark is beyond the tolerance and is
  * DROPPED by Spark's stateful late filter before the operator (the
  * watermark contract — visible data loss, never a mis-ordered fold;
  * the in-operator `require` is defense-in-depth). Buffer bound = one
  * watermark delay of the key's arrivals; buffered groups arm a
  * watermark+1 timeout so no-data batches flush the tail.
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
  * Second-granularity gaps keep Σgap² inside Long for any realistic
  * per-key volume (documented in the batch operator).
  */
object StreamingBeacon {

  // ts mirrors t_us as a Timestamp: the watermark attribute must survive
  // into the state op's input (selecting it away fails the
  // UnsupportedOperationChecker for EventTimeTimeout)
  case class Ev(user_id: Long, t_us: Long, event_id: Long,
                ts: java.sql.Timestamp)
  case class Pend(t_us: Long, event_id: Long)
  // explicit seen-flag, NOT a -1 timestamp sentinel: a magic negative
  // `last` would conflate "no previous event" with valid pre-1970
  // timestamps and silently skip their gaps — the engine keeps
  // pre-epoch time in-discipline (see RangeJoin's exact floor division)
  case class BeaconState(seen: Boolean, last: Long, n: Long, sg: Long,
                         sgg: Long, lastArr: Long, buf: Seq[Pend])
  case class BeaconRow(user_id: Long, n_gaps: Long, sg: Long, sgg: Long)

  def gaps(spark: SparkSession, events: DataFrame, idleHorizonUs: Long,
           lateness: String = "0 seconds"): Dataset[BeaconRow] = {
    import spark.implicits._

    def foldReady(s0: BeaconState, wUs: Long): BeaconState = {
      val (ready, rest) = s0.buf.partition(_.t_us <= wUs)
      var s = s0.copy(buf = rest)
      ready.sortBy(e => (e.t_us, e.event_id)).foreach { e =>
        if (s.seen) {
          val g = (e.t_us - s.last) / 1000000L
          s = s.copy(last = e.t_us, n = s.n + 1L, sg = s.sg + g,
            sgg = s.sgg + g * g)
        } else s = s.copy(seen = true, last = e.t_us)
      }
      s
    }

    def arm(state: GroupState[BeaconState], s: BeaconState, wMs: Long): Unit =
      state.setTimeoutTimestamp(
        if (s.buf.nonEmpty) wMs + 1
        else math.max(wMs + 1, s.lastArr / 1000L + idleHorizonUs / 1000L))

    def fn(uid: Long, batch: Iterator[Ev],
           state: GroupState[BeaconState]): BeaconRow = {
      val wMs = state.getCurrentWatermarkMs()
      val wUs = wMs * 1000L
      if (state.hasTimedOut) {
        val s = foldReady(state.get, wUs)
        if (s.lastArr / 1000L + idleHorizonUs / 1000L <= wMs) state.remove()
        else { state.update(s); arm(state, s, wMs) }
        BeaconRow(uid, s.n, s.sg, s.sgg)
      } else {
        var s = state.getOption.getOrElse(
          BeaconState(seen = false, 0L, 0L, 0L, 0L, Long.MinValue, Nil))
        batch.foreach { e =>
          require(wMs == 0 || e.t_us >= wUs,
            s"StreamingBeacon: event at t_us=${e.t_us} arrived below the " +
              s"watermark ($wUs) — beyond the configured reorder tolerance; " +
              "raise `lateness` or fix the topic's per-key ordering")
          s = s.copy(lastArr = math.max(s.lastArr, e.t_us),
            buf = s.buf :+ Pend(e.t_us, e.event_id))
        }
        s = foldReady(s, wUs)
        state.update(s)
        arm(state, s, wMs)
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
