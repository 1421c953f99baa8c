package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Shared streaming-parity landing: drain a stream into checkpointed
  * parquet with one AvailableNow run. `withBatchId` tags rows for
  * Update-mode latest-emission compaction on read (needed when the emitted
  * measure is NOT monotone — additive rollups; monotone measures like max
  * registers or grow-only counts compact with a plain read-side max
  * instead). Returns the number of micro-batches that carried input rows.
  */
object Landing {

  /** A drain that outlives this has hung — fail loudly, don't block CI. */
  private val DrainTimeoutMs = 15 * 60 * 1000L

  def availableNow(stream: DataFrame, sink: String, ckpt: String,
                   mode: OutputMode, withBatchId: Boolean = false): Int = {
    // recentProgress is a ring buffer (numRecentProgressUpdates, default
    // 100): a deeper backlog would silently under-count the returned
    // input-batch number that parity paths assert on. Raise it for this
    // drain only — the session conf is shared, so restore it after.
    val conf = stream.sparkSession.conf
    val progressKey = "spark.sql.streaming.numRecentProgressUpdates"
    val prevProgress = conf.getOption(progressKey)
    conf.set(progressKey, "10000")
    try {
      val q = stream.writeStream
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          val b = if (withBatchId) batch.withColumn("batch_id", lit(batchId)) else batch
          b.write.mode("append").parquet(sink)
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(DrainTimeoutMs)) {
        q.stop()
        throw new IllegalStateException(
          s"AvailableNow drain to $sink did not terminate within ${DrainTimeoutMs / 1000}s")
      }
      q.recentProgress.count(_.numInputRows > 0)
    } finally prevProgress match {
      case Some(v) => conf.set(progressKey, v)
      case None    => conf.unset(progressKey)
    }
  }
}
