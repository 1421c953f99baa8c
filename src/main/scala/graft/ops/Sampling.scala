package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic hash-based sampling and dataset splits — the operations a
  * training pipeline runs to carve a corpus into train/val/test and to
  * down-sample over-represented slices to a target mixture.
  *
  * Everything keys off [[Hashing.md5Long]] of the stable document key, so:
  *   - assignment is a pure per-row expression (no shuffle, no state, no
  *     RNG): the same document lands in the same split on every run, on
  *     any cluster size, and in streaming and batch alike;
  *   - adding documents never reassigns existing ones (contrast
  *     `randomSplit`, which depends on partitioning and seed plumbing);
  *   - the DuckDB oracle reproduces the assignment bit-for-bit.
  *
  * This mirrors how production corpora pin splits (hash of url/doc id), and
  * at 100 TB it composes with any scan: the split/sample predicate pushes
  * into the same stage as the read, costing one md5 per row.
  */
object Sampling {

  /** Hash bucket in [0, buckets) for a key column (uniform by md5). A salt
    * decorrelates independent sampling decisions on the same key.
    */
  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column =
    pmod(Hashing.md5Long(concat(key.cast("string"), lit(salt))), lit(buckets.toLong))

  /** Train/val/test assignment from cumulative percentage cut points:
    * bucket < trainPct -> train; < trainPct+valPct -> val; else test.
    */
  def split(key: Column, trainPct: Int = 80, valPct: Int = 10,
            salt: String = ""): Column = {
    val b = hashBucket(key, 100, salt)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Keep-predicate sampling `pctx1000 / 1000` of rows, deterministically
    * by key (e.g. `samplePermille(col("doc_id"), 125)` keeps 12.5%).
    */
  def samplePermille(key: Column, pctx1000: Int, salt: String = "s"): Column =
    hashBucket(key, 1000, salt) < pctx1000

  /** Per-stratum down-sampling to target permille rates: rows whose
    * stratum is absent from `rates` are kept whole. The rates map is
    * config-scale metadata compiled into one when-chain — no join, no
    * shuffle; this is how a language/source rebalance runs inside the scan
    * stage.
    */
  def stratifiedKeep(key: Column, stratum: Column, rates: Map[String, Int],
                     salt: String = "s"): Column = {
    val b = hashBucket(key, 1000, salt)
    rates.toSeq.sortBy(_._1).foldRight(lit(true)) { case ((s, permille), els) =>
      when(stratum === lit(s), b < permille).otherwise(els)
    }
  }

  // ---- DuckDB oracle fragments (keep in lock-step) ----

  def sqlHashBucket(keyExpr: String, buckets: Int, salt: String = ""): String = {
    // the salt lands inside a single-quoted SQL literal — double any quotes
    // so an adversarial salt can't corrupt the oracle text
    val lit = salt.replace("'", "''")
    s"((${Hashing.sqlMd5Long(s"CAST($keyExpr AS VARCHAR) || '$lit'")}) % $buckets + $buckets) % $buckets"
  }

  def sqlSplit(keyExpr: String, trainPct: Int = 80, valPct: Int = 10,
               salt: String = ""): String = {
    val b = sqlHashBucket(keyExpr, 100, salt)
    s"(CASE WHEN $b < $trainPct THEN 'train' WHEN $b < ${trainPct + valPct} THEN 'val' ELSE 'test' END)"
  }

  def sqlSamplePermille(keyExpr: String, pctx1000: Int, salt: String = "s"): String =
    s"(${sqlHashBucket(keyExpr, 1000, salt)} < $pctx1000)"
}
