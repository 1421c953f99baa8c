package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the ingest-side twin of
  * [[graft.ops.Dedup.exact]]: re-deliveries and content duplicates inside
  * the watermark horizon are dropped before they reach downstream
  * aggregates. (The reference's ingest replays inserts without any such
  * guard — clickhouse/clickhouse.py:19-21 sets insert_deduplicate=False —
  * so replays double-count; this operator is the missing guard.)
  *
  * Uses `dropDuplicatesWithinWatermark` keyed on the content hash: state
  * holds one entry per distinct content seen within the lateness horizon
  * and is evicted as the watermark advances — O(distinct-in-horizon)
  * state, no unbounded growth, no event-time column needed in the key.
  */
object StreamingDedup {

  /** Drop rows whose `textCol` content already appeared within the
    * watermark horizon. Keeps the first arrival; passes all columns
    * through.
    */
  def exact(stream: DataFrame, tsCol: String, textCol: String,
            lateness: String = "1 hour"): DataFrame =
    stream
      .withColumn("__content_hash", md5(col(s"`$textCol`")))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
}
