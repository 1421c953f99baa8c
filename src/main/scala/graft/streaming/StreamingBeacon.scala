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
  * StreamingFunnel no-batch-id discipline. Ordering contract as the
  * funnel's: the topic delivers a key's events in (event-time, event_id)
  * order across batches (Kafka per-partition ordering when keyed by
  * user); within a batch the state function sorts. Under that contract
  * the accumulated gap multiset equals the batch window's exactly, so
  * the batch beaconing query IS the oracle. Second-granularity gaps keep
  * Σgap² inside Long for any realistic per-key volume (documented in the
  * batch operator).
  */
object StreamingBeacon {

  case class Ev(user_id: Long, t_us: Long, event_id: Long)
  // explicit seen-flag, NOT a -1 timestamp sentinel: a magic negative
  // `last` would conflate "no previous event" with valid pre-1970
  // timestamps and silently skip their gaps — the engine keeps
  // pre-epoch time in-discipline (see RangeJoin's exact floor division)
  case class BeaconState(seen: Boolean, last: Long, n: Long, sg: Long, sgg: Long)
  case class BeaconRow(user_id: Long, n_gaps: Long, sg: Long, sgg: Long)

  def gaps(spark: SparkSession, events: DataFrame): Dataset[BeaconRow] = {
    import spark.implicits._

    def fn(uid: Long, batch: Iterator[Ev],
           state: GroupState[BeaconState]): BeaconRow = {
      var s = state.getOption.getOrElse(BeaconState(false, 0L, 0L, 0L, 0L))
      batch.toArray.sortBy(e => (e.t_us, e.event_id)).foreach { e =>
        if (s.seen) {
          val g = (e.t_us - s.last) / 1000000L
          s = BeaconState(seen = true, e.t_us, s.n + 1L, s.sg + g, s.sgg + g * g)
        } else s = s.copy(seen = true, last = e.t_us)
      }
      state.update(s)
      BeaconRow(uid, s.n, s.sg, s.sgg)
    }

    events.select(col("user_id"), col("t_us"), col("event_id")).as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }
}
