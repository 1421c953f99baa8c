package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) — the
  * fixed-size frequency sketch for 100 TB streams: `d` hash rows × `w`
  * counters; point estimate = min over rows of the counter each seeded
  * hash lands on. Always an OVER-estimate (collisions only add), with
  * error ≤ 2·N/w at probability 1 − 2^−d.
  *
  * Complements the engine's other frequency machinery: Misra-Gries
  * ([[MisraGries]]) tracks WHICH keys are heavy (candidate set, no
  * counts); CMS answers "how often did key x occur" for ANY x after one
  * pass, without storing keys at all — the shape used for per-token
  * frequency floors over corpora whose vocabulary doesn't fit anywhere.
  *
  * Implemented as a typed [[Aggregator]]: the d×w counter matrix is the
  * buffer, `merge` is elementwise addition — so partial sketches build
  * map-side and only O(d·w) longs cross the shuffle, the defining
  * mergeability of the sketch family. Hashing is the engine-standard
  * seeded md5 ([[Hashing.md5LongSeeded]]: `md5(token || "#" || seed)`,
  * first 15 hex chars as a 60-bit Long, mod w), so the DuckDB oracle
  * reproduces every register — and therefore every estimate — bit for
  * bit. Registers are deterministic functions of the input MULTISET
  * (addition commutes), no ordering caveats.
  */
object CountMin {

  /** Typed CMS aggregator over raw token strings. Buffer = d·w counters,
    * row-major (`row s`, `bucket b` at index `s*w + b`).
    */
  class CountMinAggregator(d: Int, w: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(d > 0 && w > 0, s"d and w must be positive: d=$d w=$w")

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(buf: Array[Long], token: String): Array[Long] = {
      if (token != null) {
        var s = 0
        while (s < d) {
          buf(s * w + bucket(token, s)) += 1L
          s += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

    /** JVM twin of [[Hashing.md5LongSeeded]] mod w — must agree with the
      * Column/DuckDB forms bit for bit (UTF-8 bytes, lowercase hex).
      */
    private def bucket(token: String, seed: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val dig = md.digest((token + "#" + seed).getBytes("UTF-8"))
      // first 15 hex chars = first 7 bytes + high nibble of the 8th
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
      h = (h << 4) | ((dig(7) & 0xf0L) >> 4)
      (h % w).toInt // h is 60-bit non-negative
    }
  }

  /** The full d×w register matrix of `tokenCol` as one aggregate Column
    * (row-major Long array) — collect it (config-scale: d·w longs) and
    * probe with [[estimate]], or keep it relational and index with
    * `element_at`.
    */
  def sketch(tokenCol: Column, d: Int = 4, w: Int = 64): Column =
    udaf(new CountMinAggregator(d, w), Encoders.STRING).apply(tokenCol)

  /** Column-side point estimate for `tokenCol` against a COLLECTED
    * register matrix (literal lookup — no second pass over the corpus):
    * min over the d rows of the register the token's seeded hash selects.
    */
  def estimate(tokenCol: Column, regs: Array[Long], d: Int = 4, w: Int = 64): Column = {
    require(regs.length == d * w, s"register matrix must be d*w: ${regs.length} != ${d * w}")
    import org.apache.spark.sql.functions._
    val perRow = (0 until d).map { s =>
      val row = typedLit(regs.slice(s * w, (s + 1) * w).toSeq)
      element_at(row, (Hashing.md5LongSeeded(tokenCol, s) % w + 1).cast("int"))
    }
    least(perRow: _*)
  }
}
