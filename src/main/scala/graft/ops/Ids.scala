package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Contiguous global id assignment in key order WITHOUT a global
  * single-task window — the export-sharding primitive (training shards,
  * stable sample ids, resumable scans all want dense 0..N-1 ids).
  *
  * `row_number() OVER (ORDER BY key)` funnels the whole table through ONE
  * task at the window (the straggler shape this engine bans); this is the
  * distributed formulation every shuffle-based engine uses for
  * zipWithIndex:
  *
  *  1. range-partition by the key and sort within partitions — Spark's
  *     own total-order machinery (sampled range boundaries; partition p's
  *     keys all precede partition p+1's);
  *  2. ONE config-scale job counts rows per partition (numParts longs to
  *     the driver);
  *  3. a mapPartitions adds each partition's exclusive-prefix-sum offset
  *     to its local 0-based index.
  *
  * The assigned id equals the row's rank in the total key order, however
  * the sampled boundaries fell — boundary placement moves rows between
  * partitions but never reorders them. The caller must pass a UNIQUE key
  * (enforced nowhere cheaper than the contract: duplicate keys straddling
  * a boundary would take arbitrary relative ids). Two passes over the
  * range-shuffled data (count + assign), so the shuffled frame is
  * CacheRegistry-persisted across them.
  */
object Ids {

  def contiguous(df: DataFrame, keyCol: String,
                 numParts: Int): DataFrame =
    contiguous(df, Seq(keyCol), numParts)

  /** Multi-column form: the total order is the lexicographic order of
    * `keyCols` — callers make it UNIQUE (append a unique id as the last
    * column when the leading key can collide).
    */
  def contiguous(df: DataFrame, keyCols: Seq[String],
                 numParts: Int = 32): DataFrame = {
    require(numParts >= 1, s"numParts=$numParts")
    require(keyCols.nonEmpty, "keyCols must order the rows")
    val kcols = keyCols.map(c => col(s"`$c`"))
    val sorted = CacheRegistry.persist(
      df.repartitionByRange(numParts, kcols: _*)
        .sortWithinPartitions(kcols: _*))
    val counts = sorted
      .groupBy(spark_partition_id().as("pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until numParts).map { p =>
        val o = p -> acc; acc += counts.getOrElse(p, 0L); o
      }.toMap
    }
    val outSchema = StructType(sorted.schema.fields :+
      StructField("gid", LongType, nullable = false))
    val nFields = sorted.schema.fields.length
    // RDD mapPartitionsWithIndex, deliberately: the partition INDEX must
    // bind at definition time. A Dataset mapPartitions reading
    // TaskContext.getPartitionId() reports the RUNNING task's id — under
    // a downstream coalesce(1) all parent partitions execute inside task
    // 0 and every chunk would take offset 0 (observed: ids restarting per
    // chunk). The RDD index is the parent partition's own, whatever task
    // later computes it.
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val base = offsets(pid)
      var i = 0L
      it.map { r =>
        val vals = new Array[Any](nFields + 1)
        var f = 0
        while (f < nFields) { vals(f) = r.get(f); f += 1 }
        vals(nFields) = base + i
        i += 1L
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
