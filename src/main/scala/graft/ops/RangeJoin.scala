package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic interval (range-predicate) join: points `ts` against intervals
  * `[lo, hi)` with NO equi-key.
  *
  * Spark has no native range-join operator — the naive
  * `points.join(intervals, ts >= lo && ts < hi)` plans as
  * BroadcastNestedLoopJoin (every point row scans every interval: O(n·m),
  * and a driver OOM once the interval side outgrows the broadcast
  * threshold). The classic distributed formulation is TIME BINNING:
  *
  *  1. each interval explodes to the `binSeconds`-wide epoch bins it
  *     overlaps (an interval of width w covers ceil(w/bin)+1 bins — pick
  *     `binSeconds` near the typical interval width so this stays O(1));
  *  2. each point maps to its single bin;
  *  3. shuffled equi-join on the bin key, residual `ts >= lo && ts < hi`
  *     filter re-checks exactness.
  *
  * A (point, interval) match appears EXACTLY once: the point has one bin,
  * and the interval's exploded bin list is distinct. Both sides shuffle on
  * the bin key, so the join parallelizes like any equi-join; at 100 TB the
  * bin key inherits the time-locality of the data (recent-time hot bins →
  * AQE skew-join splits them; the residual filter keeps correctness under
  * any such split). Intervals explode ~2 rows each at the default sizing —
  * the shuffle carries O(points + 2·intervals) rows, never O(n·m).
  */
object RangeJoin {

  /** Inner interval join: rows of `points` paired with every row of
    * `intervals` whose `[loCol, hiCol)` half-open window contains
    * `tsCol`. All columns of both inputs survive (bin key dropped).
    *
    * `tsCol`/`loCol`/`hiCol` are timestamp columns; `binSeconds` is the
    * bin width (choose ≈ the typical interval width).
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   tsCol: String, loCol: String, hiCol: String,
                   binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    val w = binSeconds * 1000000L // micros
    // Exact integer floor division on the Long micros. A double `/` would
    // misround for |micros| >= 2^53 (~year 2255 / deep pre-epoch), and a
    // point binned differently from its interval's bin list is silently
    // dropped — not caught by the residual filter. pmod keeps the floor
    // semantics (round toward -inf) exact for pre-1970 timestamps too.
    def floorDivBin(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")
    val ib = intervals.withColumn("__bin",
      explode(sequence(
        floorDivBin(unix_micros(col(loCol))),
        floorDivBin(unix_micros(col(hiCol))))))
    val pb = points.withColumn("__bin",
      floorDivBin(unix_micros(col(tsCol))))
    pb.join(ib, Seq("__bin"))
      .filter(col(tsCol) >= col(loCol) && col(tsCol) < col(hiCol))
      .drop("__bin")
  }
}
