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

  /** Domain-mix reweighting: down-sample each group so the surviving
    * corpus hits the target mix `targets` (permille per group, summing
    * 1000) at MAXIMUM volume — the data-mixing step of a training
    * pipeline ("30% web, 25% code, ..."). The derivation is pure integer
    * floor division, so the oracle reproduces rates bit-for-bit:
    *
    *   T      = min_g (n_g * 1000 / f_g)   largest total the mix admits
    *   rate_g = f_g * T / n_g              permille keep-rate per group
    *
    * One metadata aggregate collects the per-group counts (config-scale
    * driver state — groups are domains, not rows; the deriveBlocks
    * pattern), the rates compile into a when-chain, and the apply pass is
    * a pure hash-threshold predicate riding the scan — no join, no
    * shuffle, streaming-safe.
    */
  def mixReweight(df: org.apache.spark.sql.DataFrame, grp: Column, key: Column,
                  targets: Map[Long, Long], salt: String = "m"): org.apache.spark.sql.DataFrame = {
    require(targets.values.sum == 1000L, s"target permilles must sum to 1000: $targets")
    require(targets.values.forall(_ > 0), s"every target must be positive: $targets")
    val counts = df.groupBy(grp.as("__g")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(counts.keySet == targets.keySet,
      s"groups ${counts.keySet} != targets ${targets.keySet}")
    val t = targets.map { case (g, f) => counts(g) * 1000L / f }.min
    val rates = targets.map { case (g, f) => g -> f * t / counts(g) }
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(-1L)) {
      case (els, (g, r)) => when(grp === lit(g), lit(r)).otherwise(els)
    }
    df.filter(hashBucket(key, 1000, salt) < rateCol)
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
