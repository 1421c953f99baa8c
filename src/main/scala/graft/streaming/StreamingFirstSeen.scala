package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming first-seen (novelty) detector — the ingest-time shape of
  * `q_sec_first_seen`: a (user, event_type) pair appearing for the FIRST
  * time is emitted exactly once, with the day it appeared — the
  * new-behavior alert primitive evaluated at ingest instead of by a
  * nightly scan.
  *
  * State per user is the SET of event types already seen — bounded by
  * the type vocabulary (config-scale per key), not by event volume; the
  * emission stream is append-only (each pair exactly once under the
  * ordered-topic contract), so the landing needs no compaction at all —
  * the strongest landing discipline of the streaming family.
  *
  * STATE RETENTION: `EventTimeTimeout` (the StreamingFunnel contract) —
  * a user idle past `idleHorizonUs` drops their seen-set; a reappearing
  * user's already-known types would then re-emit as "new". That is the
  * honest semantics of bounded novelty state: "first seen within the
  * horizon". Callers size the horizon to the novelty window the alert
  * is defined over (the fixture query's horizon exceeds the topic span,
  * so streamed == all-time batch first-seen exactly; expiry is pinned
  * in StreamingTtlSpec).
  *
  * Ordering contract as the funnel's: the topic delivers a user's
  * events in time order across batches; within a batch the fold sorts.
  * A pair's first event then lands in the batch holding its minimum
  * timestamp, so the emitted day equals the batch `min(day)` — the
  * batch census IS the oracle.
  */
object StreamingFirstSeen {

  case class Ev(user_id: Long, typ: String, t_us: Long,
                ts: java.sql.Timestamp)
  case class SeenState(types: Seq[String])
  case class NewPair(user_id: Long, event_type: String, day: Long)

  def firstSeen(spark: SparkSession, events: DataFrame,
                idleHorizonUs: Long, lateness: String = "0 seconds")
      : Dataset[NewPair] = {
    import spark.implicits._

    def fn(uid: Long, batch: Iterator[Ev],
           state: GroupState[SeenState]): Iterator[NewPair] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var seen = state.getOption.map(_.types.toSet).getOrElse(Set.empty)
        var lastUs = Long.MinValue
        val out = Vector.newBuilder[NewPair]
        batch.toArray.sortBy(e => (e.t_us, e.typ)).foreach { e =>
          lastUs = math.max(lastUs, e.t_us)
          if (!seen.contains(e.typ)) {
            seen += e.typ
            // Java `/` truncates toward zero — the SAME convention as the
            // batch queries' Spark `div` AND the DuckDB oracles' `//`
            // (both truncate; verified `(-5)//3 = -1` in DuckDB), so the
            // streamed day equals the batch census day even for
            // pre-1970 (negative-epoch) timestamps.
            out += NewPair(uid, e.typ, e.t_us / 86400000000L)
          }
        }
        state.update(SeenState(seen.toSeq.sorted))
        state.setTimeoutTimestamp(math.max(
          state.getCurrentWatermarkMs() + 1,
          lastUs / 1000L + idleHorizonUs / 1000L))
        out.result().iterator
      }
    }

    events.select(col("user_id"), col("event_type").as("typ"), col("t_us"))
      .withColumn("ts", timestamp_micros(col("t_us")))
      .withWatermark("ts", lateness)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
