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

  /** Numeric per-column profile of `df` in ONE scan: row count, null
    * count, exact distinct count, min/max, and an exact fixed-point mean.
    * `quant` is the fixed-point denominator for the mean (100 for
    * 2-decimal money columns, 1 for integer keys): values are quantized
    * to `round(v·quant)` longs, summed exactly (callers keep
    * `quant·Σv < 2^63` — epoch-micros sums would overflow; profile those
    * as categorical), divided once at the end.
    *
    * The multi-column distinct counts compile to one Expand
    * (factor = #cols) feeding a single partial+final aggregate — one pass
    * over the data, |cols| rows out. At extreme scale an approximate
    * profile would swap `countDistinct` for the engine's HLL registers;
    * this report is the exact-by-contract variant.
    */
  def profileNumeric(df: DataFrame, cols: Seq[(String, Long)]): DataFrame = {
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { case (name, q) =>
      val c = col(name)
      Seq(
        count(c).as(s"${name}__n"),
        countDistinct(c).as(s"${name}__nd"),
        min(c).cast("double").as(s"${name}__min"),
        max(c).cast("double").as(s"${name}__max"),
        sum(round(c * lit(q)).cast("long")).as(s"${name}__sq"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { case (name, q) =>
      val n = col(s"${name}__n")
      struct(
        lit(name).as("col_name"),
        n.as("n"),
        (col("__total") - n).as("n_null"),
        col(s"${name}__nd").as("n_distinct"),
        col(s"${name}__min").as("min_v"),
        col(s"${name}__max").as("max_v"),
        round(col(s"${name}__sq").cast("double") / lit(q.toDouble) /
          n.cast("double"), 4).as("mean_v"))
    }
    row.select(inline(array(entries: _*)))
  }

  /** Categorical per-column profile: same one-scan shape, min/max as
    * strings (binary collation on both engines), no mean. Also the right
    * surface for wide integers (epoch micros) whose exact sum would
    * overflow the fixed-point mean. */
  def profileCategorical(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { name =>
      val c = col(name)
      Seq(
        count(c).as(s"${name}__n"),
        countDistinct(c).as(s"${name}__nd"),
        min(c).cast("string").as(s"${name}__min"),
        max(c).cast("string").as(s"${name}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { name =>
      val n = col(s"${name}__n")
      struct(
        lit(name).as("col_name"),
        n.as("n"),
        (col("__total") - n).as("n_null"),
        col(s"${name}__nd").as("n_distinct"),
        col(s"${name}__min").as("min_s"),
        col(s"${name}__max").as("max_s"))
    }
    row.select(inline(array(entries: _*)))
  }

  /** Exact parts-per-million ratio, deterministic cross-engine: `1e6·g`
    * is double-exact below 2^53, the division is one IEEE op, floor pins
    * the last bit. (DuckDB: `CAST(floor(1e6 * g / t) AS BIGINT)`.)
    */
  private def ppm(g: Column, t: Column): Column =
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
}
