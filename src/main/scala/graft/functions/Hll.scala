package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality sketch over the cross-engine 60-bit md5 hash
  * ([[Hashing.md5Long]]), p = 9 → 512 registers.
  *
  * The sketch is expressed as plain relational algebra, which is exactly why
  * it scales: registers are `groupBy(group, reg_idx).agg(max(rho))` — one
  * shuffle whose map-side partial is the register merge itself, O(m) state
  * per group crossing the wire regardless of input size. The same property
  * makes sketches from disjoint partitions/days mergeable by a further
  * `max` — the re-aggregation shape the reference applies to its saved
  * aggregates (sum-of-sums; here max-of-maxes).
  *
  * Hash layout: top 9 of the 60 hash bits pick the register, the low 51 bits
  * are the rank window; rho = 1 + leading-zeros-in-window = 52 - bitlength.
  * Bit length via `length(bin(w))` — Spark and DuckDB agree bit-for-bit on
  * `bin` (no leading zeros, `bin(0)='0'`), so every register value is an
  * exact integer the oracle reproduces.
  *
  * Estimation (standard HLL): raw = alpha_m * m^2 / sum(2^-rho), with the
  * linear-counting small-range correction. The harmonic sum is carried
  * scaled by 2^52 so it is an exact BIGINT in both engines (2^(52-rho) ≤
  * 2^51, ≤ 512 terms < 2^61); the only floating point is the final scalar
  * formula, built from the same two integers by the same expression tree on
  * both sides.
  */
object Hll {

  val P: Int = 9
  val M: Int = 1 << P            // 512 registers
  val WBits: Int = 51            // rank window width (60-bit hash - p)
  val WMask: Long = (1L << WBits) - 1
  val MaxRho: Int = WBits + 1    // 52
  val Pow52: Long = 1L << 52     // harmonic-sum scale

  /** alpha_512 * m^2 * 2^52 as one Scala-computed double constant; embedded
    * in SQL via Double.toString (shortest round-trip — DuckDB parses back
    * the identical bits).
    */
  val AlphaM2Scaled: Double = (0.7213 / (1.0 + 1.079 / M)) * M * M * Pow52.toDouble

  /** Register index: top p bits of the 60-bit hash. */
  def regIdx(h: Column): Column = shiftright(h, WBits).cast("int")

  /** Rank: 1 + leading zeros of the 51-bit window (52 when the window is 0). */
  def rho(h: Column): Column = {
    val w = h.bitwiseAND(lit(WMask))
    when(w === 0, lit(MaxRho)).otherwise(lit(MaxRho) - length(bin(w))).cast("int")
  }

  /** Registers for one group: `groupBy(groupCols :+ regIdx).agg(max(rho))`.
    * Convenience wrappers so query code reads declaratively.
    */
  def sqlRegIdx(hashExpr: String): String = s"CAST(($hashExpr >> $WBits) AS INT)"

  def sqlRho(hashExpr: String): String =
    s"(CASE WHEN ($hashExpr & $WMask) = 0 THEN $MaxRho " +
      s"ELSE $MaxRho - length(bin(($hashExpr & $WMask))) END)"

  /** Scaled harmonic denominator from the per-group register table:
    * S = sum(2^(52-rho)) over present registers + 2^52 per absent register.
    * Exact BIGINT.
    */
  def harmonicS(nPresent: Column, sPresent: Column): Column =
    sPresent + (lit(M.toLong) - nPresent) * lit(Pow52)

  /** 2^(52-rho) for one register (shiftleft with a column count needs expr). */
  def registerTerm(rhoCol: String): Column = expr(s"shiftleft(1L, $MaxRho - $rhoCol)")

  def sqlRegisterTerm(rhoExpr: String): String = s"(1::BIGINT << ($MaxRho - $rhoExpr))"

  /** The estimate from (n_zero_registers, scaled harmonic sum) — identical
    * expression tree on both engines. Linear counting below the 2.5m
    * threshold when empty registers remain, raw HLL otherwise.
    */
  def estimate(zeros: Column, harmonicS: Column): Column = {
    val raw = lit(AlphaM2Scaled) / harmonicS.cast("double")
    val lc = lit(M.toDouble) * log(lit(M.toDouble) / zeros.cast("double"))
    round(when(raw <= lit(2.5 * M) && zeros > 0, lc).otherwise(raw), 2)
  }

  def sqlEstimate(zerosExpr: String, harmonicExpr: String): String = {
    val alpha = java.lang.Double.toString(AlphaM2Scaled)
    val raw = s"($alpha / CAST($harmonicExpr AS DOUBLE))"
    val lc = s"(${M.toDouble} * ln(${M.toDouble} / CAST($zerosExpr AS DOUBLE)))"
    s"round(CASE WHEN $raw <= ${2.5 * M} AND $zerosExpr > 0 THEN $lc ELSE $raw END, 2)"
  }
}
