package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign each document a
  * (bin, offset) position in a stream of fixed-size context windows —
  * the concat-and-chunk packing used to build LM training batches
  * (documents are concatenated in a deterministic order and the stream is
  * cut every `ctxTokens` tokens; a document may straddle a cut).
  *
  * Layout is a prefix sum: running = SUM(size) OVER (PARTITION BY shard
  * ORDER BY key), bin = floor((running - size) / ctx), offset =
  * (running - size) % ctx. Everything after the window is a per-row
  * expression.
  *
  * Scale posture: the window is PARTITIONED BY the shard column — packing
  * is per-shard by design (one global prefix sum would funnel 100 TB
  * through a single partition; real pipelines pack within input shards
  * and emit shard-relative bins, exactly this shape). Each shard's prefix
  * sum is one sort within its partition, parallel across shards.
  */
object Packing {

  /** Adds `bin` and `offset` columns: the context-window index (per shard)
    * and the token offset inside that window where the document starts.
    * `sizeCol` is the document's token count, `orderCol` the deterministic
    * packing order within a shard.
    */
  def packConcat(df: DataFrame, shardCol: String, orderCol: String,
                 sizeCol: String, ctxTokens: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
    df.withColumn("__start", sum(col(sizeCol)).over(w) - col(sizeCol))
      .withColumn("bin", floor(col("__start") / lit(ctxTokens.toLong)))
      .withColumn("offset", pmod(col("__start"), lit(ctxTokens.toLong)))
      .drop("__start")
  }
}
