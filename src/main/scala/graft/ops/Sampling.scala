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

  /** Weighted sampling priority (Duffield–Lund–Thorup priority sampling,
    * JACM'07): priority = hash/weight with the 60-bit md5 hash standing in
    * for the uniform u — keeping the n SMALLEST priorities per group
    * samples rows with probability ~proportional to `weight`, without
    * replacement, deterministically (same corpus → same sample, and
    * adding rows can only displace, never reshuffle, survivors — the
    * property hash-split pinning gives unweighted sampling, extended to
    * weights). The division is INTEGRAL (`div`): hash/weight reaches
    * ~2^60/w, past Double's 2^53 mantissa for small weights, so a float
    * quotient would tie-break by rounding noise and diverge from the
    * oracle's exact `//`. Pure per-row expression + per-group top-n: at
    * 100 TB it rides the scan and a TakeOrderedAndProject-shaped window,
    * no extra shuffle beyond the group partitioning.
    */
  def priority(key: Column, weight: Column): Column =
    call_function("div", Hashing.md5Long(key.cast("string")), weight.cast("long"))

  /** DuckDB SQL fragment mirroring [[priority]] (both engines floor a
    * non-negative quotient, so `//` == `div` here).
    */
  def sqlPriority(keyExpr: String, weightExpr: String): String =
    s"(${Hashing.sqlMd5Long(keyExpr)} // CAST($weightExpr AS BIGINT))"

  /** Temperature-flattened sampling rates (the mT5/XLM-R multilingual
    * rebalancing trick at α = 1/2): rare groups are up-weighted relative
    * to their natural share by sampling ∝ √n_g instead of ∝ n_g, so a
    * dominant language stops drowning the tail without the pipeline
    * hand-writing a target mix (that explicit-targets variant is
    * [[mixReweight]]). The target total is half the corpus; per-group
    * keep-rates in ppm:
    *
    *   w_g      = floor(1e6 · √n_g)            (√ is IEEE-exact on both
    *                                            engines — the reason for
    *                                            α = 1/2 over a libm pow)
    *   rate_g   = min(1e6, floor(1e6 · (N div 2) · w_g / Σw / n_g))
    *
    * Every step is either exact integer math or a fixed left-associated
    * chain of IEEE double ops, so DuckDB re-derives each rate bit for
    * bit. Same scale shape as [[mixReweight]]: one config-scale metadata
    * aggregate, rates as a when-chain, apply as a pure hash-threshold
    * scan predicate — no join, no shuffle, streaming-safe.
    */
  /** Driver-state ceiling for the mix/temperature metadata collects:
    * group keys are training-mix DOMAINS (config-scale), never row-scale
    * data. The limit+require turns a high-cardinality caller mistake into
    * a clear error instead of a driver-size surprise (the deriveBlocks
    * convention). */
  private val MaxMixGroups = 10000

  def temperatureRates(df: org.apache.spark.sql.DataFrame,
                       grp: Column): Map[String, Long] = {
    // cast-to-string so an arbitrary group expression (int, date, …)
    // collects cleanly instead of ClassCastException-ing at getString
    val counts = df.groupBy(grp.cast("string").as("__g"))
      .agg(count(lit(1)).as("__n"))
      .limit(MaxMixGroups + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.size <= MaxMixGroups,
      s"temperatureRates: grp exceeds $MaxMixGroups distinct values — " +
        "mix groups must be config-scale domains, not row-scale keys")
    require(counts.nonEmpty, "temperatureRates: empty corpus (no groups)")
    val wq = counts.map { case (g, n) =>
      g -> math.floor(1e6 * math.sqrt(n.toDouble)).toLong }
    val wsum = wq.values.sum
    val t = counts.values.sum / 2
    counts.map { case (g, n) =>
      g -> math.min(1000000L, math.floor(
        1e6 * t.toDouble * wq(g).toDouble / wsum.toDouble / n.toDouble).toLong)
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
      .limit(MaxMixGroups + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(counts.size <= MaxMixGroups,
      s"mixReweight: grp exceeds $MaxMixGroups distinct values — " +
        "mix groups must be config-scale domains, not row-scale keys")
    require(counts.keySet == targets.keySet,
      s"groups ${counts.keySet} != targets ${targets.keySet}")
    val t = targets.map { case (g, f) => counts(g) * 1000L / f }.min
    val rates = targets.map { case (g, f) => g -> f * t / counts(g) }
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(-1L)) {
      case (els, (g, r)) => when(grp === lit(g), lit(r)).otherwise(els)
    }
    df.filter(hashBucket(key, 1000, salt) < rateCol)
  }

  /** Fractional-epoch replication — the UPSAMPLING side of data mixing
    * ("repeat the code slice 2.3 epochs, the low-quality web slice 0.5"):
    * each row of group g appears `f_g div 1000` times plus one more copy
    * on the hash-selected `f_g mod 1000` permille — so expected volume is
    * exactly n_g · f_g/1000 and the choice of WHICH rows carry the
    * fractional epoch is deterministic (DoReMi-style domain weights
    * become repeat factors this way). The whole-copy count is resolved at
    * plan time per group (a when-chain, no join); replication is one
    * `explode(sequence(1, n))` whose generator argument is a per-row
    * scalar — output rows carry an `epoch` index so downstream shuffles
    * (packing, batching) spread copies instead of co-locating them.
    * Factors ≤ 0 drop the group, and so does a group ABSENT from the
    * map (the fold's default is 0 — "not in the mix" is the natural
    * reading for an upsampler, unlike mixReweight's rate derivation
    * which requires full coverage and checks it). The sequence never
    * sees n < 1 (the auto-reverse trap): zero-copy rows are filtered
    * first.
    */
  def epochReplicate(df: org.apache.spark.sql.DataFrame, grp: Column, key: Column,
                     epochsPermille: Map[Long, Long],
                     salt: String = "ep"): org.apache.spark.sql.DataFrame = {
    val whole = epochsPermille.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (els, (g, f)) => when(grp === lit(g), lit(math.max(f, 0L) / 1000L)).otherwise(els)
    }
    val fracPermille = epochsPermille.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (els, (g, f)) => when(grp === lit(g), lit(math.max(f, 0L) % 1000L)).otherwise(els)
    }
    val nCopies = whole +
      when(hashBucket(key, 1000, salt) < fracPermille, 1L).otherwise(0L)
    df.withColumn("__ncopies", nCopies)
      .filter(col("__ncopies") >= 1L)
      .withColumn("epoch", explode(sequence(lit(1L), col("__ncopies"))))
      .drop("__ncopies")
  }

  /** Exact per-group token-budget selection — "keep 2B tokens of code,
    * 1B of web": docs are consumed in a deterministic hash-randomized
    * priority order (md5 bucket, then key) and each group keeps the
    * longest prefix whose token sum fits its budget.
    *
    * The naive form is a corpus-wide window cumsum per group — one task
    * per group at 100 TB. This implementation is exact with only
    * config-scale coordination:
    *   1. one partial+final aggregate of (group, bucket) token sums —
    *      `groups × buckets` rows to the driver (the mixReweight /
    *      k-centroid metadata pattern, NOT a data collect);
    *   2. per group, the driver finds the boundary bucket b* where the
    *      cumulative sum crosses the budget; buckets < b* are wholly
    *      kept by a pure scan predicate (no shuffle);
    *   3. ONLY the boundary bucket's rows (≈ 1/buckets of the group)
    *      pay an intra-bucket window cumsum.
    * Raise `buckets` until corpus/buckets fits one task — the window
    * never sees more than that.
    *
    * Selection is identical to the global-window definition, which is
    * what the DuckDB oracle replays (`ORDER BY bucket, key`). `key` must
    * be UNIQUE within each group (it is the deterministic priority
    * order): the cumsum runs over a ROWS frame, and ties would make the
    * kept prefix engine-arbitrary.
    */
  def tokenBudgetKeep(df: org.apache.spark.sql.DataFrame, grp: Column, key: Column,
                      tokens: Column, budgets: Map[Long, Long],
                      buckets: Int = 64, salt: String = "tb"): org.apache.spark.sql.DataFrame = {
    require(budgets.values.forall(_ >= 0), s"budgets must be non-negative: $budgets")
    val b = hashBucket(key, buckets, salt)
    val perBucket = df.groupBy(grp.as("__g"), b.as("__b"))
      .agg(sum(tokens).as("__t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val grps = perBucket.keySet.map(_._1)
    require(grps.subsetOf(budgets.keySet),
      s"groups $grps not covered by budgets ${budgets.keySet}")
    // boundary bucket + remaining budget inside it, per group
    val bounds: Map[Long, (Long, Long)] = grps.map { g =>
      var cum = 0L
      var bstar = buckets.toLong
      var rem = 0L
      var i = 0L
      while (i < buckets && bstar == buckets.toLong) {
        val t = perBucket.getOrElse((g, i), 0L)
        if (cum + t > budgets(g)) { bstar = i; rem = budgets(g) - cum }
        cum += t
        i += 1
      }
      g -> (bstar, rem)
    }.toMap
    val bstarCol = bounds.toSeq.sortBy(_._1).foldLeft(lit(-1L)) {
      case (els, (g, (bs, _))) => when(grp === lit(g), lit(bs)).otherwise(els)
    }
    val remCol = bounds.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (els, (g, (_, r))) => when(grp === lit(g), lit(r)).otherwise(els)
    }
    val wholly = df.filter(b < bstarCol)
    // ROWS frame, not the default RANGE: RANGE peer-sums duplicate keys,
    // so a tie group straddling the budget would be dropped wholesale
    // where the ROWS/row_number oracle keeps a prefix. Selection among
    // EQUAL keys is engine-arbitrary either way — `key` must be unique
    // per group (doc_id here), which the deterministic priority order
    // already requires.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(grp).orderBy(key)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val boundary = df.filter(b === bstarCol)
      .withColumn("__cum", sum(tokens).over(w))
      .filter(col("__cum") <= remCol)
      .drop("__cum")
    wholly.union(boundary)
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
