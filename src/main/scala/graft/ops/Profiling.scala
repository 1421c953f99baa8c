package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset profiling, declarative data-quality constraints, and
  * distribution-drift scoring — the "is this data fit to train on" gate a
  * large-scale pipeline runs before (and between) every training snapshot.
  * The reference pipeline has no profiling stage (it trusts QRadar's typed
  * API responses end to end); these are engine-native additions in the
  * deequ/TFDV shape, built so every report is a handful of rows derived
  * from full scans — never a collect of data.
  *
  * Scale design, common to all three:
  *  - every metric is a MERGEABLE aggregate (counts, sums of fixed-point
  *    integers, min/max), so map-side partials do the heavy lifting and
  *    the shuffle carries one row per partition;
  *  - output is config-scale (one row per column / constraint / bin),
  *    never data-scale;
  *  - fixed-point integer sums (the TpchQueries cents discipline) keep
  *    means exact under any partitioning, so reports are bit-identical
  *    across cluster sizes — a drift MONITOR must not itself drift.
  *
  * The numeric/categorical split keeps both report schemas null-free:
  * a unified schema would carry typed NULL columns, a cross-engine
  * comparison surface the oracle contract has never exercised.
  */
object Profiling {

  /** Numeric per-column profile of `df`: row count, null count, exact
    * distinct count, min/max, and an exact fixed-point mean.
    * `quant` is the fixed-point denominator for the mean (100 for
    * 2-decimal money columns, 1 for integer keys): values are quantized
    * to `round(v·quant)` longs, summed exactly (callers keep
    * `quant·Σv < 2^63` — epoch-micros sums would overflow; profile those
    * as categorical), divided once at the end.
    *
    * Shape: one SINGLE-distinct aggregate per column, unioned — measured
    * against the former one-scan multi-distinct form (every extra
    * `countDistinct` adds a row to the Expand, so 4 columns scan 5× the
    * rows through the distinct hash aggregate: 3.0 s vs 0.30 s warm at
    * sf0.1, 10×). Per-branch scans are column-pruned to ONE column, so
    * total IO matches the one-scan form on columnar storage while each
    * branch plans the cheap two-phase distinct with no Expand; branches
    * are independent stages and schedule concurrently. At extreme scale
    * an approximate profile would swap `countDistinct` for the engine's
    * HLL registers; this report is the exact-by-contract variant.
    */
  def profileNumeric(df: DataFrame, cols: Seq[(String, Long)]): DataFrame =
    cols.map { case (name, q) =>
      val c = col(name)
      df.agg(count(lit(1)).as("__total"),
          count(c).as("__n"),
          countDistinct(c).as("__nd"),
          min(c).cast("double").as("__min"),
          max(c).cast("double").as("__max"),
          sum(round(c * lit(q)).cast("long")).as("__sq"))
        .select(
          lit(name).as("col_name"),
          col("__n").as("n"),
          (col("__total") - col("__n")).as("n_null"),
          col("__nd").as("n_distinct"),
          col("__min").as("min_v"),
          col("__max").as("max_v"),
          round(col("__sq").cast("double") / lit(q.toDouble) /
            col("__n").cast("double"), 4).as("mean_v"))
    }.reduce(_ unionByName _)

  /** Categorical per-column profile: same union-of-single-distinct
    * shape as [[profileNumeric]], min/max as strings (binary collation
    * on both engines), no mean. Also the right surface for wide integers
    * (epoch micros) whose exact sum would overflow the fixed-point
    * mean. */
  def profileCategorical(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { name =>
      val c = col(name)
      df.agg(count(lit(1)).as("__total"),
          count(c).as("__n"),
          countDistinct(c).as("__nd"),
          min(c).cast("string").as("__min"),
          max(c).cast("string").as("__max"))
        .select(
          lit(name).as("col_name"),
          col("__n").as("n"),
          (col("__total") - col("__n")).as("n_null"),
          col("__nd").as("n_distinct"),
          col("__min").as("min_s"),
          col("__max").as("max_s"))
    }.reduce(_ unionByName _)

  /** Exact parts-per-million ratio, deterministic cross-engine: `1e6·g`
    * is double-exact below 2^53, the division is one IEEE op, floor pins
    * the last bit. (DuckDB: `CAST(floor(1e6 * g / t) AS BIGINT)`.)
    */
  def ppm(g: Column, t: Column): Column =
    floor(lit(1e6) * g.cast("double") / t.cast("double")).cast("long")

  /** A row-predicate constraint: fraction of rows satisfying `good` must
    * reach `thresholdPpm` (1000000 = all rows). */
  final case class Check(name: String, good: Column, thresholdPpm: Long)

  /** Evaluate row-predicate constraints over `df` in ONE aggregate pass
    * (each check is a conditional sum — map-side combinable). Returns
    * (check_name, metric_ppm, passed), one row per check.
    */
  def predicateChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = count(lit(1)).as("__t") +: checks.zipWithIndex.map {
      case (ck, i) => sum(when(ck.good, 1L).otherwise(0L)).as(s"__g$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.zipWithIndex.map { case (ck, i) =>
      val m = ppm(col(s"__g$i"), col("__t"))
      struct(lit(ck.name).as("check_name"), m.as("metric_ppm"),
        (m >= ck.thresholdPpm).as("passed"))
    }
    row.select(inline(array(entries: _*)))
  }

  /** Key-uniqueness constraint: distinct/total ratio in ppm. */
  def uniquenessCheck(df: DataFrame, key: String, name: String,
                      thresholdPpm: Long): DataFrame = {
    val row = df.agg(countDistinct(col(key)).as("__d"),
      count(lit(1)).as("__t"))
    val m = ppm(col("__d"), col("__t"))
    row.select(lit(name).as("check_name"), m.as("metric_ppm"),
      (m >= thresholdPpm).as("passed"))
  }

  /** Referential-integrity constraint: fraction of child rows whose key
    * exists in the parent, via a left-semi join on the key (shuffle-join
    * sized by the keys, never a collect; Spark broadcasts the parent side
    * automatically when it is small enough). */
  def riCheck(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String,
              name: String, thresholdPpm: Long): DataFrame = {
    val matched = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
        "left_semi")
      .agg(count(lit(1)).as("__g"))
    val total = child.agg(count(lit(1)).as("__t"))
    val m = ppm(col("__g"), col("__t"))
    matched.crossJoin(total).select(lit(name).as("check_name"),
      m.as("metric_ppm"), (m >= thresholdPpm).as("passed"))
  }

  /** Embedding covariance diagnostics — the anisotropy/collapse check run
    * on an embedding table before it backs an ANN index (a collapsed or
    * dominant direction ruins cosine recall): the upper-triangle
    * covariance matrix of the milli-quantized vectors, exact integer
    * sums.
    *
    * Scale shape: per-partition OUTER-PRODUCT accumulation in one typed
    * mapPartitions (each task folds its rows into a dim×dim Long matrix
    * and emits dim·(dim+1)/2 partial rows — the shuffle carries
    * partitions × dim², never corpus × dim²; the declarative
    * posexplode-self-join form would), then one final aggregate; per-dim
    * sums ride a posexplode aggregate (map-side combine collapses each
    * partition to dim rows) and come back as two broadcast joins of a
    * dim-row table. Covariance displayed as
    * (n·S_ij − S_i·S_j)/n²/1e6 (milli² → float units), exact Long
    * numerators at fixture scale (document the 2^63 headroom: |q| ≤
    * ~1300 milli-units ⇒ S_ij per pair < n·1.7e6 — overflow needs
    * n > 5e12 vectors).
    */
  /** The shared per-partition outer-product scatter fold over the
    * milli-quantized vector column `q`: returns (pair sums (i, j, sij, n)
    * — upper triangle, already combined across partitions — and per-dim
    * sums (i, s)). `q` is CacheRegistry-persisted because both outputs
    * scan it (the quantize pass runs once). One copy of the fold and its
    * overflow-headroom reasoning serves [[embCovariance]] and
    * [[pcaTopComponent]].
    */
  private def scatterFold(q0: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val q = CacheRegistry.persist(q0)
    val pairSchema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("sij", LongType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val partials = q.mapPartitions { it =>
      var mat: Array[Array[Long]] = null
      var n = 0L
      var dim = 0
      it.foreach { r =>
        val v = r.getSeq[Long](0)
        if (mat == null) { dim = v.length; mat = Array.ofDim[Long](dim, dim) }
        n += 1
        var i = 0
        while (i < dim) {
          val vi = v(i)
          var j = i
          while (j < dim) { mat(i)(j) += vi * v(j); j += 1 }
          i += 1
        }
      }
      if (mat == null) Iterator.empty
      else (for { i <- 0 until dim; j <- i until dim }
        yield Row(i, j, mat(i)(j), n)).iterator
    }(org.apache.spark.sql.Encoders.row(pairSchema))
    val sums = q.select(posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy("i").agg(sum(col("qi")).as("s"))
    val pair = partials.groupBy("i", "j")
      .agg(sum(col("sij")).as("sij"), sum(col("n")).as("n"))
    (pair, sums)
  }

  def embCovariance(df: DataFrame, embCol: String): DataFrame = {
    val (pair, sums) =
      scatterFold(df.select(Similarity.quantize(col(embCol)).as("q")))
    pair
      .join(broadcast(sums.select(col("i"), col("s").as("si"))), Seq("i"))
      .join(broadcast(sums.select(col("i").as("j"), col("s").as("sj"))), Seq("j"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("sij"),
        // + 0.0 collapses IEEE -0.0 to +0.0 (DuckDB's round keeps the
        // sign bit, Spark's drops it — the hash compares reprs)
        (round((col("n") * col("sij") - col("si") * col("sj")).cast("double") /
          (col("n").cast("double") * col("n").cast("double")) / lit(1e6), 6)
          + lit(0.0)).as("cov"))
  }

  /** Top principal component of the embedding table by EXACT-INTEGER
    * power iteration — the dimensionality diagnostic behind whitening /
    * anisotropy fixes, in the engine's deterministic-arithmetic
    * discipline (a float eigensolver differs across BLAS builds and
    * partitionings; this one hash-compares).
    *
    * Corpus-scale work is ONE pass: the same per-partition outer-product
    * fold as [[embCovariance]] (shuffle carries partitions × dim² partial
    * rows). Everything after is config-scale driver math on the dim×dim
    * integer scatter matrix A = n·S_ij − S_i·S_j (the un-normalized
    * covariance — same eigenvectors, no division):
    *   1. right-shift A by max(0, bitlen(max|A|) − 24) so each entry
    *      fits 2^24 (overflow headroom: |Σ_j A'v_j| ≤ dim·2^24·2^20 ≤
    *      2^50 at dim ≤ 64 — require()d);
    *   2. iterate v ← A'·v from the all-ones (×1e6) start, renormalizing
    *      each round by v ← w div (max|w| div 1e6 + 1);
    * every step is Long addition, multiplication, truncating division,
    * and bit-length — all replayed operation-for-operation by the DuckDB
    * oracle's unrolled CTE stages, so the fixed-`iters` loadings are
    * bit-identical. Sign follows the deterministic start vector; fixed
    * iteration count (not a convergence test) is the oracle contract.
    */
  def pcaTopComponent(df: DataFrame, embCol: String,
                      iters: Int = 8): DataFrame = {
    val (pair, sumsDf) =
      scatterFold(df.select(Similarity.quantize(col(embCol)).as("q")))
    val sums = sumsDf.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pairRows = pair.collect()
    require(pairRows.nonEmpty, "pcaTopComponent: empty input")
    val n = pairRows.head.getAs[Long]("n")
    val dim = sums.size
    require(dim <= 64, s"pcaTopComponent: dim=$dim exceeds the 2^50 " +
      "overflow headroom bound (64)")
    // A = n·S_ij − S_i·S_j is assembled in BigInt: in raw Long the
    // n·S_ij product wraps silently once n exceeds ~2.3e6 vectors
    // (n²·|q|²_max > 2^63 at |q| ≤ ~1300 milli-units), while the DuckDB
    // oracle's checked BIGINT would error. BigInt is exact at any n —
    // dim² driver-side entries, config-scale cost — and BigInt `/`
    // truncates toward zero exactly like the Long division it replaces,
    // so fixture hashes are unchanged. Post-shift entries fit 2^24 and
    // the Long iteration headroom argument below takes over.
    val aBig = Array.ofDim[BigInt](dim, dim)
    pairRows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val v = BigInt(n) * BigInt(r.getAs[Long]("sij")) -
        BigInt(sums(i)) * BigInt(sums(j))
      aBig(i)(j) = v; aBig(j)(i) = v
    }
    val m0 = aBig.iterator.flatten.map(_.abs).max
    val shift = math.max(0, m0.bitLength - 24)
    val a = Array.tabulate(dim, dim)((i, j) =>
      (aBig(i)(j) / (BigInt(1) << shift)).toLong)
    var v = Array.fill(dim)(1000000L)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0L
        var j = 0
        while (j < dim) { acc += a(i)(j) * v(j); j += 1 }
        acc
      }
      val m = w.iterator.map(math.abs).max
      val d = m / 1000000L + 1L
      v = w.map(_ / d)
    }
    val spark = df.sparkSession
    import spark.implicits._
    v.zipWithIndex.map { case (lv, i) => (i.toLong, lv) }.toSeq
      .toDF("i", "loading_u")
      .select(col("i"), col("loading_u"),
        (round(col("loading_u").cast("double") / lit(1e6), 6) + lit(0.0))
          .as("loading"))
  }

  /** Label-separability report — the "are these labels learnable from
    * these embeddings" QA gate for classifier training data: per label,
    * the mean squared distance of members to their own centroid (intra)
    * vs the squared distance to the nearest OTHER centroid (inter), and
    * their ratio (higher = cleaner separation; a ratio near or below 1
    * means the label clouds overlap and a classifier will struggle).
    *
    * Exact integer math end to end (milli-quantized vectors, centroid =
    * elementwise floor(sum/n) — the engine's k-means conventions), so
    * the oracle replays every distance bit for bit. Scale shape: one
    * posexplode aggregate for centroid sums (map-side combined,
    * labels×dim rows out), centroids collected driver-side (config-scale
    * — the k-centroid pattern) and compiled into a when-chain array
    * literal for ONE distance scan (no join, corpus never reshuffles);
    * inter-centroid distances are pure driver math over labels².
    */
  def labelSeparability(df: DataFrame, embCol: String,
                        labelCol: String): DataFrame = {
    val q = df.select(col(labelCol).cast("long").as("label"),
      Similarity.quantize(col(embCol)).as("q"))
    val dims = q.select(col("label"), posexplode(col("q")).as(Seq("i", "v")))
    val centRows = dims.groupBy("label", "i")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("i"),
        floor(col("s").cast("double") / col("n").cast("double"))
          .cast("long").as("c"))
      .collect()
    val centMap: Map[Long, Array[Long]] = centRows
      .groupBy(_.getLong(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getLong(2))
      }
    require(centMap.size >= 2,
      s"labelSeparability needs >= 2 labels (got ${centMap.size}) — " +
        "inter-centroid distance is undefined otherwise")
    val centCol = centMap.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("array<bigint>")) {
        case (els, (l, arr)) =>
          when(col("label") === l, typedLit(arr.toSeq)).otherwise(els)
      }
    val dist = q.withColumn("c", centCol)
      .withColumn("d2", aggregate(
        zip_with(col("q"), col("c"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x))
    val intra = dist.groupBy("label")
      .agg(count(lit(1)).as("n"), sum(col("d2")).as("S"))
    val inter: Map[Long, Long] = centMap.map { case (l, cl) =>
      l -> centMap.collect { case (m, cm) if m != l =>
        cl.zip(cm).map { case (a, b) => val d = a - b; d * d }.sum
      }.min
    }
    val interCol = inter.toSeq.sortBy(_._1).foldLeft(lit(-1L)) {
      case (els, (l, v)) => when(col("label") === l, lit(v)).otherwise(els)
    }
    intra.withColumn("I", interCol)
      .select(col("label"), col("n"),
        round(col("S").cast("double") / col("n").cast("double") / lit(1e6), 4)
          .as("intra_msd"),
        round(col("I").cast("double") / lit(1e6), 4).as("inter_min"),
        round(col("I").cast("double") * col("n").cast("double") /
          greatest(col("S"), lit(1L)).cast("double"), 4).as("sep"))
  }

  /** Snapshot diff — the data-versioning audit between two corpus
    * snapshots: one full-outer shuffle join on the key, per-row status
    * (`added` / `removed` / `changed` / `same`, compare columns matched
    * null-safely), one conditional aggregate. Output is the 4-row status
    * census — the "what moved between yesterday's and today's snapshot"
    * report that gates incremental retraining. Scale: the join shuffles
    * on the key (AQE-splittable), nothing else is materialized.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame = {
    val aSel = a.select(col(key).as("__k") +:
      compareCols.map(c => col(c).as(s"__a_$c")): _*)
      .withColumn("__ina", lit(1))
    val bSel = b.select(col(key).as("__k") +:
      compareCols.map(c => col(c).as(s"__b_$c")): _*)
      .withColumn("__inb", lit(1))
    val joined = aSel.join(bSel, Seq("__k"), "full_outer")
    val differs = compareCols.map(c => !(col(s"__a_$c") <=> col(s"__b_$c")))
      .reduce(_ || _)
    joined.select(
      when(col("__ina").isNull, "added")
        .when(col("__inb").isNull, "removed")
        .when(differs, "changed")
        .otherwise("same").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
  }

  /** Per-group quantile normalization via a BINNED ECDF — the feature
    * transform every ML pipeline applies ("rank-to-uniform"), in the
    * shape that survives 100 TB. The naive form is a per-group rank
    * window over the raw rows — ONE task per group at scale. This is
    * exact at bin granularity with only config-scale coordination: one
    * stats aggregate (broadcast back), one (group × bin) count aggregate
    * (map-side combined), a cumulative window over those nBins rows per
    * group, and the per-row normalization is a broadcast-join + scan —
    * the corpus never sorts and never reshuffles.
    *
    * Output: the key columns + (grp, bin, norm_ppm) where norm_ppm =
    * floor(1e6 · |values in strictly lower bins| / n_group) — the
    * left-continuous ECDF at the bin edge, exact integers end to end.
    */
  def quantileNormBinned(df: DataFrame, grp: Column, value: Column,
                         keys: Seq[String], nBins: Int): DataFrame = {
    val base = df.select(keys.map(col) ++
      Seq(grp.as("__g"), value.cast("double").as("__v")): _*)
    val stats = base.groupBy("__g").agg(min(col("__v")).as("__minv"),
      max(col("__v")).as("__maxv"))
    val binW = (col("__maxv") - col("__minv")) / lit(nBins.toDouble)
    val binned = base.join(broadcast(stats), Seq("__g"))
      .withColumn("bin", when(binW === 0.0, lit(0L)).otherwise(
        least(floor((col("__v") - col("__minv")) / binW).cast("long"),
          lit(nBins - 1L))))
    val counts = binned.groupBy("__g", "bin").agg(count(lit(1)).as("__c"))
    val below = Window.partitionBy("__g").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = Window.partitionBy("__g")
    val cum = counts
      .withColumn("__cum", coalesce(sum(col("__c")).over(below), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(total))
      .select(col("__g"), col("bin"), col("__cum"), col("__n"))
    binned.join(broadcast(cum), Seq("__g", "bin"))
      .select(keys.map(col) ++ Seq(col("__g").as("grp"), col("bin"),
        floor(lit(1e6) * col("__cum").cast("double") /
          col("__n").cast("double")).cast("long").as("norm_ppm")): _*)
  }

  /** Population Stability Index between the two slices of `df` selected
    * by the boolean `sliceA`: equal-width-bin `value` over its global
    * range, Laplace-smooth the per-slice bin frequencies
    * (p = (c+1)/(t+nBins) — a bin empty on one side must not produce
    * ln 0), psi = Σ (p−q)·ln(p/q). The classic train-vs-serve /
    * snapshot-vs-snapshot drift monitor: psi < 0.1 stable, > 0.25 shifted.
    *
    * Shape: one stats aggregate (broadcast back as a 1-row literal), one
    * binning scan with a conditional-sum groupBy (nBins rows out), one
    * window over those nBins rows for the totals. Nothing data-scale
    * leaves the executors. Every arithmetic step is IEEE-identical in
    * DuckDB (`ln` agrees past the 4-dp rounding), so the oracle replays
    * the full computation.
    */
  def psiDrift(df: DataFrame, value: Column, sliceA: Column,
               nBins: Int): DataFrame = {
    val stats = df.agg(min(value).cast("double").as("__minv"),
      max(value).cast("double").as("__maxv"))
    val binW = (col("__maxv") - col("__minv")) / lit(nBins.toDouble)
    val binned = df.select(value.cast("double").as("__v"), sliceA.as("__a"))
      .crossJoin(broadcast(stats))
      .withColumn("bin",
        when(binW === 0.0, lit(0L)).otherwise(
          least(floor((col("__v") - col("__minv")) / binW).cast("long"),
            lit(nBins - 1L))))
    val counts = binned.groupBy("bin").agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("cb"))
    val all = Window.partitionBy()   // config-scale: ≤ nBins rows
    val p = (col("ca") + lit(1L)).cast("double") /
      (sum(col("ca")).over(all) + lit(nBins.toLong)).cast("double")
    val q = (col("cb") + lit(1L)).cast("double") /
      (sum(col("cb")).over(all) + lit(nBins.toLong)).cast("double")
    counts.withColumn("__contrib", (p - q) * log(p / q))
      .agg(count(lit(1)).as("n_bins"), round(sum(col("__contrib")), 4).as("psi"))
  }

  /** Binned two-sample Kolmogorov–Smirnov statistic between slice A and
    * slice B of `value`: max |ECDF_A − ECDF_B| over the bin boundaries.
    * The distribution-free companion to [[psiDrift]] (PSI weights the
    * middle of the distribution, KS catches a shifted tail the
    * Laplace-smoothed bins wash out). Same scale shape: one binning pass
    * over the data, then every window runs over the ≤ nBins count rows.
    * ECDFs are raw (KS needs no smoothing); the division chain is pinned
    * left-associated so both engines round identically.
    */
  def ksDrift(df: DataFrame, value: Column, sliceA: Column,
              nBins: Int): DataFrame = {
    val stats = df.agg(min(value).cast("double").as("__minv"),
      max(value).cast("double").as("__maxv"))
    val binW = (col("__maxv") - col("__minv")) / lit(nBins.toDouble)
    val binned = df.select(value.cast("double").as("__v"), sliceA.as("__a"))
      .crossJoin(broadcast(stats))
      .withColumn("bin",
        when(binW === 0.0, lit(0L)).otherwise(
          least(floor((col("__v") - col("__minv")) / binW).cast("long"),
            lit(nBins - 1L))))
    val counts = binned.groupBy("bin").agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("cb"))
    val all = Window.partitionBy()   // config-scale: ≤ nBins rows
    val cum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fa = sum(col("ca")).over(cum).cast("double") /
      sum(col("ca")).over(all).cast("double")
    val fb = sum(col("cb")).over(cum).cast("double") /
      sum(col("cb")).over(all).cast("double")
    counts.withColumn("__d", abs(fa - fb))
      .agg(count(lit(1)).as("n_bins"), round(max(col("__d")), 6).as("ks"))
  }

  /** Exact k-th smallest (k = (n+1) div 2 → lower median, equal to the
    * (n−1)p index at p = 0.5) WITHOUT a global sort — the single-group
    * form of [[exactQuantilesBinnedGrouped]]. Returns one row
    * (n, median); the picked value is exact, no floating arithmetic
    * touches it.
    */
  def exactMedianBinned(df: DataFrame, value: Column,
                        nBins: Int = 1024): DataFrame =
    exactQuantilesBinnedGrouped(df, lit("all"), value, Seq(50), nBins)
      .select(col("n"), col("value").as("median"))

  /** The exact MONOTONE fixed-point fold the one-pass grouped quantile
    * keys on — a piecewise power-of-two scale (both branches are exact
    * in binary floating point: only the exponent moves) mapped to Long:
    *
    *   |v| < 2^41 : x = floor(v·2^20)                     (|x| < 2^61)
    *   else       : x = sign(v)·(2^61 + min(floor(|v|·2^−20), 2^61))
    *
    * Monotone across the seam (±2^61 < ±(2^61 + 2^21)) and exact up to
    * |v| = 2^81 ≈ 2.4e24 — past any epoch-nanos or cents magnitude the
    * engine carries; beyond that values saturate at ±2^62 (one shared
    * cell — still correct, only the pick window widens). Values
    * differing by < 2^−20 (or < 2^20 on the wide branch) collapse into
    * one x — harmless: x never decides the result, it only bounds the
    * final pick window, which runs over DISTINCT exact `__v` values.
    */
  private def xOf(v: Column): Column = {
    val wide = (lit(1L << 61) +
      least(floor(abs(v) / lit(1048576.0)).cast("long"), lit(1L << 61))) *
      when(v < 0.0, lit(-1L)).otherwise(lit(1L))
    // NaN: every comparison is false, so it would fall through to the
    // wide branch where cast(NaN as long) = 0 lands it on the MID-range
    // 2^61 cell — but both engines SORT NaN above every value, so the
    // monotone key must too: pin it to the +saturation cell (+2^62),
    // where the pick window's distinct-__v sort puts it last.
    when(isnan(v), lit(1L << 62))
      .when(abs(v) < lit(2199023255552.0) /* 2^41 */,
        floor(v * lit(1048576.0)).cast("long")).otherwise(wide)
  }

  /** The data-independent MONOTONE cell key over [[xOf]]'s fixed-point
    * fold: (bit-length, top-7-bits) of |x| with the sign mirrored —
    *
    *   x > 0 : key = bitlen(x)·64 + (x >> max(bitlen−7, 0))
    *   x = 0 : key = 0
    *   x < 0 : key = −keyOf(−x)
    *
    * Every step is exact integer arithmetic (`length(bin(x))` and
    * `shiftright` — no libm call whose rounding could reorder a cell
    * edge), and the key is monotone in `__v`: within one bit-length the
    * shifted prefix is monotone, across bit-lengths the ranges are
    * disjoint and ordered (bl·64+127 < (bl+1)·64+64), and negation
    * mirrors. Cell resolution is ~1/64 relative width (64 sub-cells per
    * octave); the key SPACE is ≤ ~8k per sign regardless of data, so a
    * per-(group, cell) aggregate is config-scale metadata by
    * construction — no prior stats pass needed to define the grid.
    */
  private def cellKey(x: Column): Column = graft.plans.CellKey.keyCol(x)

  /** Grouped exact order statistics (k = floor(q·(n−1)) + 1, the (n−1)p
    * index rule) for several quantiles per group, without sorting any
    * group — the per-group `percentile`/sort forms hold a group's values
    * in one task at 100 TB — and with ONE eager metadata pass on the
    * common path:
    *
    *   1. ONE aggregate over the data-independent monotone log-grid
    *      ([[cellKey]]): per-(group, cell) count + exact x-bounds —
    *      group sizes, target cells, and residual ranks all fall out of
    *      this single config-scale collect (the former separate stats
    *      pass existed only to define an affine grid; the log grid needs
    *      no stats).
    *   2. Only for targets whose hit cell exceeds `pickWindowCap` rows:
    *      one ADAPTIVE recursion — per-cell integer sub-binning
    *      (nBins sub-cells over the cell's collected x-span, exact Long
    *      arithmetic) restricted to the oversized cells, relocating the
    *      residual rank. Fixture- and config-scale runs never enter it;
    *      at 100 TB it bounds the pick window to ~cellspan/nBins.
    *   3. One lazy pick pass: semi-join the hit (group, cell, sub)
    *      spec, group by exact value (duplicates collapse — the
    *      cumulative window runs over the cell's DISTINCT values),
    *      broadcast-join the residual ranks, pick each target exactly.
    *
    * Bin parameters travel as BROADCAST JOINS against config-scale
    * frames — never per-group when-chain literals, whose O(#groups)
    * expression depth hits the Janino 64KB interpreted-fallback wall
    * past a few hundred groups (codegen at 1k groups pinned in
    * ProfilingSpec). Values are picked, never computed — bit-exact under
    * any partitioning.
    */
  def exactQuantilesBinnedGrouped(df: DataFrame, grp: Column, value: Column,
                                  qPcts: Seq[Int], nBins: Int = 1024,
                                  pickWindowCap: Long = 1L << 16)
      : DataFrame = {
    require(qPcts.nonEmpty, "exactQuantilesBinnedGrouped: no quantiles requested")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(grp.cast("string").as("__g"),
      value.cast("double").as("__v")).filter(col("__v").isNotNull)
    val keyed = base.withColumn("__x", xOf(col("__v")))
      .withColumn("__k", cellKey(col("__x")))
    // Eager round 1 (the only one on the common path): per-(group, cell)
    // count and exact integer bounds — config-scale by the key-space
    // bound, collected sorted so the rank walk below reads value order.
    val cells = keyed.groupBy("__g", "__k")
      .agg(count(lit(1)).as("c"), min(col("__x")).as("xmn"),
        max(col("__x")).as("xmx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    require(cells.nonEmpty, "exactQuantilesBinnedGrouped: empty input")
    val byGroup = cells.groupBy(_._1)
    // driver-side target location: (group, qPct) -> (cell, residual rank)
    case class Hit(g: String, q: Long, k: Long, cnt: Long, xmn: Long,
                   xmx: Long, r: Long, n: Long)
    val hits = byGroup.toSeq.flatMap { case (g, cs) =>
      val n = cs.map(_._3).sum
      qPcts.map { q =>
        val target = math.floor(q / 100.0 * (n - 1)).toLong + 1
        var cum = 0L
        var hit: Hit = null
        cs.foreach { case (_, k, c, xmn, xmx) =>
          if (hit == null && cum + c >= target)
            hit = Hit(g, q.toLong, k, c, xmn, xmx, target - cum, n)
          cum += c
        }
        hit
      }
    }
    // Adaptive recursion: sub-bin ONLY the oversized hit cells (exact
    // Long arithmetic: sub = (x - xmn) div w). Undersized cells get the
    // degenerate grid w = span+1 (all rows in sub 0), so the pick pass
    // below is one uniform shape either way.
    val needSub = hits.filter(h => h.cnt > pickWindowCap)
      .map(h => (h.g, h.k, h.xmn, h.xmx)).distinct
    val located: Seq[(String, Long, Long, Long, Long, Long)] =
      if (needSub.isEmpty) hits.map(h => (h.g, h.q, h.k, 0L, h.r, h.n))
      else {
        val subW = needSub
          .map { case (g, k, xmn, xmx) =>
            (g, k, xmn, math.max(1L, (xmx - xmn) / nBins + 1L)) }
        val subFrame = subW.toDF("__g", "__k", "__xmn", "__w")
        val subCounts = keyed
          .join(broadcast(subFrame), Seq("__g", "__k"))
          // `div` is exact integer division — a double `/` would wobble
          // ulps at sub-bin edges against the driver's Long walk
          .groupBy(col("__g"), col("__k"),
            expr("(__x - __xmn) div __w").as("__s"))
          .agg(count(lit(1)).as("c"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
          .toMap
        val wOf = subW.map(t => (t._1, t._2) -> t._4).toMap
        hits.map { h =>
          if (h.cnt <= pickWindowCap) (h.g, h.q, h.k, 0L, h.r, h.n)
          else {
            val maxSub = (h.xmx - h.xmn) / wOf((h.g, h.k))
            var cum = 0L; var sub = -1L; var r2 = 0L
            (0L to maxSub).foreach { s =>
              val c = subCounts.getOrElse((h.g, h.k, s), 0L)
              if (sub < 0 && cum + c >= h.r) { sub = s; r2 = h.r - cum }
              cum += c
            }
            (h.g, h.q, h.k, sub, r2, h.n)
          }
        }
      }
    // Uniform pick frame: every hit cell carries its sub-grid params
    // (degenerate w = span+1 when not recursed).
    val pickFrame = hits.map { h =>
      val w = if (h.cnt > pickWindowCap)
        math.max(1L, (h.xmx - h.xmn) / nBins + 1L)
      else h.xmx - h.xmn + 1L
      (h.g, h.k, h.xmn, w)
    }.distinct.toDF("__g", "__k", "__xmn", "__w")
    val hitSpec = located.toDF("__g", "q_pct", "__k", "__s", "__r", "n")
    val cw = Window.partitionBy("__g", "__k", "__s").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cheap x-range prefilter from the driver-known hit-cell spans: two
    // Long comparisons drop almost every row BEFORE the key expression
    // and the join evaluate (the single-group median case keeps ~1/cells
    // of the scan; multi-group unions of spans keep it conservative)
    val gxmn = hits.map(_.xmn).min
    val gxmx = hits.map(_.xmx).max
    keyed.filter(col("__x") >= lit(gxmn) && col("__x") <= lit(gxmx))
      .join(broadcast(pickFrame), Seq("__g", "__k"))
      .withColumn("__s", expr("(__x - __xmn) div __w"))
      .groupBy(col("__g"), col("__k"), col("__s"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(cw))
      .join(broadcast(hitSpec), Seq("__g", "__k", "__s"))
      .filter(col("__cum") >= col("__r"))
      .groupBy(col("__g").as("grp"), col("q_pct"))
      .agg(max(col("n")).as("n"), min(col("__v")).as("value"))
  }
}
