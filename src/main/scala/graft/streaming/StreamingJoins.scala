package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming forms of the join layer (SURVEY §2.3 on unbounded inputs).
  *
  * Stream × static dim needs no operator at all — `Lookups.lookup`'s
  * broadcast left join works verbatim on a streaming frame (per-batch
  * broadcast), which StreamingJoinsSpec pins. Stream × stream is the
  * genuinely stateful case and lives here.
  */
object StreamingJoins {

  /** Stream-stream inner join within an event-time interval: rows pair
    * when keys match and the right event falls in
    * [left_ts - windowSec, left_ts] (e.g. "purchase within an hour of a
    * signup"). Both sides are watermarked and the join condition bounds
    * event-time distance, so Spark derives state watermarks and evicts
    * buffered rows — state is O(rows inside lateness + window), not the
    * stream prefix. Matches append as soon as both sides arrive.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   keyL: String, keyR: String,
                   tsL: String, tsR: String,
                   windowSec: Long,
                   lateness: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(tsL, lateness)
    val r = right.withWatermark(tsR, lateness)
    // frame-qualified refs: the two streams usually share column names
    // (same event schema on both sides), and bare col() would be ambiguous
    l.join(r,
      l(keyL) === r(keyR) &&
        r(tsR) >= l(tsL) - expr(s"INTERVAL $windowSec SECONDS") &&
        r(tsR) <= l(tsL))
  }

  /** Stream-stream LEFT OUTER interval join — the genuinely watermark-
    * dependent contract: matches append as soon as both sides arrive
    * (like the inner join), but an UNMATCHED left row can only emit its
    * null-padded result once the watermark proves no matching right can
    * still arrive (watermark past left_ts, since the window looks
    * backward). Callers that drain with AvailableNow must advance the
    * watermark past the data afterwards (the sentinel pattern) or the
    * tail's outer rows stay buffered — see q_t21's landing.
    */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
                            keyL: String, keyR: String,
                            tsL: String, tsR: String,
                            windowSec: Long,
                            lateness: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(tsL, lateness)
    val r = right.withWatermark(tsR, lateness)
    l.join(r,
      l(keyL) === r(keyR) &&
        r(tsR) >= l(tsL) - expr(s"INTERVAL $windowSec SECONDS") &&
        r(tsR) <= l(tsL),
      "left_outer")
  }
}
