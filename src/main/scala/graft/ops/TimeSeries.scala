package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-series time-series smoothing operators (the q_ts_* family's
  * engine-native home). The reference pipeline carries no time-series
  * analytics (it ships raw events to a warehouse); these are the
  * trend/monitoring readouts a deployment derives from the same rollups.
  */
object TimeSeries {

  /** EWMA-smoothed daily count series with EXACT dyadic integer weights —
    * the scatter formulation: each (series, day) count is exploded onto
    * the ≤ `windowDays` report days it influences (the invert-the-window
    * trick — one bounded explode + one aggregate, never a per-report-day
    * backward scan, which would be O(days²) per series at 100 TB), with
    * weight `n · 2^(maxShift − off div halfLifeDays)`.
    *
    * Decay is BLOCK-DYADIC: the weight halves every `halfLifeDays` days
    * and is constant within a block — an exact-integer staircase of the
    * continuous exponential (exact at every block boundary for
    * halfLifeDays = 1, the default). Exactness is the point: dyadic
    * weights sum bit-identically under any partitioning and replay in
    * any engine, where a pow(2, -off/h) double chain would drift in the
    * last ulps (the engine-wide fixed-point discipline).
    *
    * Weight-precision bound: maxShift = (windowDays−1) div halfLifeDays
    * must stay ≤ 62 (`shiftleft(1L, s)` is a Long; 2^63 wraps) — enforced
    * with `require`. Weight SUMS widen through DECIMAL(38,0) (the t22
    * discipline): 2^62 · Σn ≤ 1e38 holds for any Σn < 2·10^19, i.e.
    * always. The unnormalized `ewma_u` display cast back to Long is the
    * caller-facing 2^63 bound and is only safe when
    * `max(n per series-day) · 2^maxShift < 2^63` — the default
    * (windowDays = 31: 2^30 headroom ≈ 8·10^9 events/series/day) keeps
    * comfortable margin; wider windows trade that headroom for reach.
    *
    * Returns (event_type, day, ewma_u, ewma): the exact unnormalized
    * Long and the 6dp display value (wsum / 2^maxShift).
    */
  def ewmaDaily(events: DataFrame, typCol: Column, tsCol: Column,
                windowDays: Int = 31, halfLifeDays: Int = 1): DataFrame = {
    require(windowDays >= 1, s"windowDays=$windowDays")
    require(halfLifeDays >= 1, s"halfLifeDays=$halfLifeDays")
    val maxShift = (windowDays - 1) / halfLifeDays
    require(maxShift <= 62,
      s"ewmaDaily: (windowDays-1) div halfLifeDays = $maxShift exceeds the " +
        "62-bit dyadic weight bound (shiftleft on Long wraps at 2^63)")
    val norm = math.pow(2.0, maxShift) // exact: a power of two ≤ 2^62
    val byDay = events
      .groupBy(typCol.as("event_type"),
        call_function("div", unix_micros(tsCol), lit(86400000000L)).as("day"))
      .agg(count(lit(1)).as("n"))
    val mx = byDay.agg(max(col("day")).as("maxd"))
    byDay.withColumn("off", explode(sequence(lit(0), lit(windowDays - 1))))
      .withColumn("rday", col("day") + col("off"))
      .crossJoin(broadcast(mx))
      .filter(col("rday") <= col("maxd"))
      .withColumn("w", col("n").cast("decimal(38,0)") *
        expr(s"shiftleft(1L, $maxShift - (off div $halfLifeDays))"))
      .groupBy(col("event_type"), col("rday").as("day"))
      .agg(sum(col("w")).as("wsum"))
      .select(col("event_type"), col("day"),
        // loud guard: a non-ANSI decimal→long cast out of range yields
        // NULL silently — enforce the documented 2^63 bound instead of
        // nulling the "exact unnormalized" column
        when(col("wsum") > lit(Long.MaxValue).cast("decimal(38,0)"),
          raise_error(concat(
            lit("ewmaDaily: unnormalized weight sum exceeds 2^63-1 for "),
            col("event_type").cast("string"),
            lit(" — narrow windowDays or raise halfLifeDays"))))
          .otherwise(col("wsum")).cast("long").as("ewma_u"),
        round(col("wsum").cast("double") / lit(norm), 6).as("ewma"))
  }
}
