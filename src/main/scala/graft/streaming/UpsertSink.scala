package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming UPSERT sink: maintains a compacted latest-per-key state
  * table under `statePath` from a change stream — the Delta-style
  * CDC-apply deployment shape, built on plain checkpointed parquet.
  * (The reference's nearest sibling is its continuous insert loop into a
  * ClickHouse MergeTree-family table, clickhouse/clickhouse.py:60-81;
  * latest-per-key merge-on-write is an ANALOGY to that warehouse's
  * background-merge model, not a behavior the reference itself ships.)
  *
  * Mechanics per micro-batch (`foreachBatch`):
  *  1. incoming rows are hash-bucketed on the key (`pmod(key, nBuckets)`
  *     — the state table's partition layout);
  *  2. ONLY the touched buckets of the current state are read back,
  *     unioned with the batch, and compacted to the max-(orderCols) row
  *     per key (a per-key window over bucket-local data);
  *  3. the merged buckets overwrite IN PLACE via dynamic partition
  *     overwrite — untouched buckets are never read or rewritten.
  *
  * Scale posture: per batch the work is O(touched-bucket state + batch),
  * not O(total state) — with time-correlated keys a batch touches few
  * buckets and the rewrite is bounded. The compaction window partitions
  * by key (bucket-local, never global). `localCheckpoint` materializes
  * the merge BEFORE the overwrite commits, so the job never scans the
  * files it is replacing mid-write. Replay safety: re-running a batch
  * after a crash OUTSIDE the overwrite commit window re-merges the same
  * rows into the same buckets — the merge is idempotent (latest-per-key
  * of an already-applied batch is a no-op), the foreachBatch contract.
  * The commit window itself is NOT atomic on plain parquet: dynamic
  * partition overwrite deletes a touched bucket's old files before the
  * new ones commit, so a crash inside that window can lose that bucket's
  * accumulated state, and replay then merges against the damaged bucket.
  * Exactly-once across arbitrary crash points therefore requires a
  * transactional table format (or staging the merged bucket to a temp
  * path and swapping); at warehouse scale the same loop runs against
  * such a format, and the bucket-pruned merge is the part that must hold
  * either way.
  *
  * Ties on `orderCols` must be impossible by construction (callers
  * include a unique id as the last order column) — otherwise
  * latest-per-key is nondeterministic.
  */
object UpsertSink {

  private val DrainTimeoutMs = 15 * 60 * 1000L

  def availableNow(stream: DataFrame, statePath: String, ckpt: String,
                   keyCol: String, orderCols: Seq[String],
                   nBuckets: Int = 16): Int = {
    require(orderCols.nonEmpty, "orderCols must order versions per key")
    val nonEmptyBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val s = batch.sparkSession
        // a null key is malformed CDC input (decodeJson keeps records
        // whose fields are null) — bucket it to the -1 sentinel and fail
        // LOUDLY rather than NPE-ing the drain or silently merging a
        // null-key state row
        val b = batch.withColumn("bucket",
          coalesce(pmod(col(keyCol), lit(nBuckets.toLong)), lit(-1L)))
        val touched = b.select("bucket").distinct()
          .collect().map(_.getLong(0))
        require(!touched.contains(-1L),
          s"UpsertSink: null $keyCol in the change stream — upsert keys must be non-null")
        if (touched.nonEmpty) {
          nonEmptyBatches.incrementAndGet()
          // Hadoop FS, not java.io.File: the state table lives wherever
          // the warehouse does (HDFS/S3 at scale; local disk here).
          // The touched buckets' directories are addressed DIRECTLY
          // (`bucket=<b>` — always a non-null long): `read.parquet(root)`
          // would list every bucket directory before pruning, a
          // store-size-dependent metadata cost the O(batch + touched
          // buckets) claim excludes. The isin filter stays on top —
          // directory targeting is an optimization, not the correctness
          // boundary.
          val sp = new org.apache.hadoop.fs.Path(statePath)
          val fs = sp.getFileSystem(s.sparkContext.hadoopConfiguration)
          val cur =
            if (fs.exists(sp)) {
              val dirs = touched.toIndexedSeq
                .map(v => new org.apache.hadoop.fs.Path(sp, s"bucket=$v"))
                .filter(fs.exists).map(_.toString)
              if (dirs.isEmpty) b.limit(0)
              else s.read.option("basePath", statePath).parquet(dirs: _*)
                .filter(col("bucket").isin(touched.toSeq: _*))
            } else b.limit(0)
          val w = Window.partitionBy(keyCol)
            .orderBy(orderCols.map(c => col(c).desc): _*)
          val merged = cur.unionByName(b)
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
          // cut lineage before overwriting the files the merge read
          val snap = merged.localCheckpoint(true)
          snap.write.mode(SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(statePath)
          snap.unpersist(blocking = true)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(DrainTimeoutMs)) {
      q.stop()
      throw new IllegalStateException(
        s"upsert drain to $statePath did not terminate within ${DrainTimeoutMs / 1000}s")
    }
    // counted inside foreachBatch: recentProgress is a ring buffer
    // (numRecentProgressUpdates, default 100) and would undercount a
    // drain longer than its window
    nonEmptyBatches.get()
  }
}
