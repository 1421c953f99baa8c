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
  * Folded state per user is the SET of event types already seen —
  * bounded by the type vocabulary (config-scale per key), not by event
  * volume; the emission stream is append-only (each pair exactly once),
  * so the landing needs no compaction at all — the strongest landing
  * discipline of the streaming family.
  *
  * REORDER TOLERANCE (r11, the StreamingFunnel contract): the emitted
  * DAY must be the pair's minimum-timestamp day, so arrivals BUFFER in
  * state and fold only once the watermark passes them, replayed in
  * (t_us, typ) order — any reordering within the `lateness` delay is
  * exactly corrected; an arrival below the current watermark is dropped
  * by Spark's stateful late filter before the operator (the watermark
  * contract — visible data loss, never a wrong first-seen day; the
  * in-operator `require` is defense-in-depth). Buffered groups arm a
  * watermark+1 timeout so no-data batches flush the tail.
  *
  * STATE RETENTION: `EventTimeTimeout` — a user idle past
  * `idleHorizonUs` drops their seen-set; a reappearing user's
  * already-known types would then re-emit as "new". That is the honest
  * semantics of bounded novelty state: "first seen within the horizon".
  * Callers size the horizon to the novelty window the alert is defined
  * over (the fixture query's horizon exceeds the topic span, so
  * streamed == all-time batch first-seen exactly; expiry is pinned in
  * StreamingTtlSpec, the reorder fold in StreamingReorderSpec).
  */
object StreamingFirstSeen {

  case class Ev(user_id: Long, typ: String, t_us: Long,
                ts: java.sql.Timestamp)
  case class Pend(t_us: Long, typ: String)
  case class SeenState(types: Seq[String], lastArr: Long, buf: Seq[Pend])
  case class NewPair(user_id: Long, event_type: String, day: Long)

  def firstSeen(spark: SparkSession, events: DataFrame,
                idleHorizonUs: Long, lateness: String = "0 seconds")
      : Dataset[NewPair] = {
    import spark.implicits._

    def foldReady(uid: Long, s0: SeenState, wUs: Long)
        : (SeenState, Vector[NewPair]) = {
      val (ready, rest) = s0.buf.partition(_.t_us <= wUs)
      var seen = s0.types.toSet
      val out = Vector.newBuilder[NewPair]
      ready.sortBy(e => (e.t_us, e.typ)).foreach { e =>
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
      (s0.copy(types = seen.toSeq.sorted, buf = rest), out.result())
    }

    def arm(state: GroupState[SeenState], s: SeenState, wMs: Long): Unit =
      state.setTimeoutTimestamp(
        if (s.buf.nonEmpty) wMs + 1
        else math.max(wMs + 1, s.lastArr / 1000L + idleHorizonUs / 1000L))

    def fn(uid: Long, batch: Iterator[Ev],
           state: GroupState[SeenState]): Iterator[NewPair] = {
      val wMs = state.getCurrentWatermarkMs()
      val wUs = wMs * 1000L
      if (state.hasTimedOut) {
        val (s, out) = foldReady(uid, state.get, wUs)
        if (s.lastArr / 1000L + idleHorizonUs / 1000L <= wMs) state.remove()
        else { state.update(s); arm(state, s, wMs) }
        out.iterator
      } else {
        var s = state.getOption.getOrElse(SeenState(Nil, Long.MinValue, Nil))
        batch.foreach { e =>
          require(wMs == 0 || e.t_us >= wUs,
            s"StreamingFirstSeen: event at t_us=${e.t_us} arrived below the " +
              s"watermark ($wUs) — beyond the configured reorder tolerance; " +
              "raise `lateness` or fix the topic's per-key ordering")
          s = s.copy(lastArr = math.max(s.lastArr, e.t_us),
            buf = s.buf :+ Pend(e.t_us, e.typ))
        }
        val (s2, out) = foldReady(uid, s, wUs)
        state.update(s2)
        arm(state, s2, wMs)
        out.iterator
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
