package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-grid histogram sketch for approximate quantiles — the shape that
  * replaces a full sort at 100 TB: ONE metadata aggregate for the [lo, hi]
  * domain (the deriveBlocks pattern — two doubles of driver state), ONE
  * binned count aggregate (map-side partial; histograms from disjoint
  * partitions/days merge by ADDING counts, the reference's sum-of-sums
  * re-agg shape), then a cumulative walk over <= `bins` rows per group.
  * Exact percentiles (`q_agg_percentiles`) stay available when the sort is
  * affordable; this is the streaming/incremental-friendly alternative with
  * a bin-width error bound of (hi-lo)/bins.
  *
  * Every arithmetic step is written with the same expression shape on both
  * engines (same IEEE ops in the same order), so the oracle reproduces the
  * estimates bit-for-bit; rank selection is pure integer (`cum*100 >= p*n`).
  */
object Histogram {

  /** Bin index in [0, bins): floor((v-lo)/(hi-lo)*bins), clamped. The
    * degenerate lo==hi domain maps everything to bin 0 (the division would
    * be NaN).
    */
  def bin(v: Column, lo: Double, hi: Double, bins: Int): Column =
    if (hi == lo) lit(0)
    else least(greatest(
      floor((v - lit(lo)) / lit(hi - lo) * bins).cast("int"), lit(0)), lit(bins - 1))

  def sqlBin(vExpr: String, loExpr: String, hiExpr: String, bins: Int): String =
    s"(CASE WHEN $hiExpr = $loExpr THEN 0 ELSE " +
      s"LEAST(GREATEST(CAST(floor(($vExpr - $loExpr) / ($hiExpr - $loExpr) * $bins) AS INT), 0), ${bins - 1}) END)"

  /** Lower-edge value of a bin: lo + (bin*(hi-lo))/bins, rounded. */
  def binValue(b: Column, lo: Double, hi: Double, bins: Int): Column =
    round((b.cast("double") * lit(hi - lo)) / lit(bins.toDouble) + lit(lo), 4)

  def sqlBinValue(bExpr: String, loExpr: String, hiExpr: String, bins: Int): String =
    s"round((CAST($bExpr AS DOUBLE) * ($hiExpr - $loExpr)) / ${bins.toDouble} + $loExpr, 4)"
}
