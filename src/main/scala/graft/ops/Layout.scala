package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-order / Morton clustering) for scan
  * pruning — the storage-side lever that makes multi-predicate scans cheap
  * at 100 TB. Parquet keeps per-file (and per-row-group) min/max stats;
  * a range-partition + sort by the interleaved z-value localizes BOTH
  * dimensions in every file, so a range predicate prunes files on either
  * column — a linear sort localizes only its leading column (a predicate
  * on any other column hits every file). LayoutSpec measures the claim:
  * a non-leading-column predicate scans every linearly-sorted file but
  * only the intersecting tile-row of z-ordered files.
  *
  * The z-value itself is a pure codegen bit-interleave (composed builtins,
  * no UDF), reproduced bit-for-bit by the oracle via the same shift/mask
  * algebra.
  */
object Layout {

  /** Morton interleave of two non-negative int columns, `bits` bits each:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Inputs are
    * masked to `bits` (callers bucket/scale real values first).
    */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits out of range")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** DuckDB fragment mirroring [[zValue2]]. */
  def sqlZValue2(aExpr: String, bExpr: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((((CAST($aExpr AS BIGINT) >> $i) & 1) << ${2 * i}) | " +
        s"(((CAST($bExpr AS BIGINT) >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** Write `df` clustered by the z-value of two dimensions: range-partition
    * into `nFiles` splits then sort within each — every output file covers
    * a compact z-range, i.e. a tile in (a, b) space. On a cluster this is
    * the one-shuffle layout job you run once per partition/day.
    */
  def zorderWrite(df: DataFrame, a: Column, b: Column, path: String,
                  nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue2(a, b, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
