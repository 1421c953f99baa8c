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
  def availableNow(stream: DataFrame, sink: String, ckpt: String,
                   mode: OutputMode, withBatchId: Boolean = false): Int = {
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
    q.awaitTermination()
    q.recentProgress.count(_.numInputRows > 0)
  }
}
