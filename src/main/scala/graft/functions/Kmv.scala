package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch — the deterministic
  * approximate-COUNT(DISTINCT) for 100 TB pipelines.
  *
  * Keep the k smallest distinct 60-bit hashes of the values; if the k-th
  * smallest is h_k, the distinct count is ≈ (k-1) * D / h_k with
  * D = 2^60 the hash domain (Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD'07). Versus
  * HyperLogLog: slightly larger state (k longs vs k registers) but the
  * estimate is an exact deterministic function of the input SET — no
  * engine-specific register layout — so with [[Hashing.md5Long]] the
  * DuckDB oracle reproduces the estimate bit for bit, something no
  * approx_count_distinct implementation offers.
  *
  * Implemented as a typed [[Aggregator]] (the engine's custom-aggregate
  * surface): reduce/merge maintain a sorted ≤k array, so partial
  * aggregation runs map-side and only O(k) state crosses the shuffle —
  * the whole point of sketching at scale.
  */
object Kmv {

  /** Typed aggregator over pre-hashed values (null-free Long hashes). */
  class KmvAggregator(val k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

    override def zero: Array[Long] = Array.empty[Long]

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        val ins = -pos - 1
        if (ins >= k) buf // larger than the current k minima
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // merge two sorted distinct arrays, keep the k smallest
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      var last = Long.MinValue
      while (o < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
          else { val v = b(j); j += 1; v }
        if (v != last || o == 0) { out(o) = v; last = v; o += 1 }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
  }

  /** Merge STORED k-minima states (array&lt;long&gt; columns) into the
    * k minima of the union — the KMV re-aggregation property: the global
    * k smallest hashes are contained in the union of per-partial k
    * smallest, so merging partials is EXACT (bit-identical to sketching
    * the union directly). This is what lets a rollup store per-hour
    * sketch states and serve day/month distinct-count dashboards without
    * rescanning raw ([[graft.plans.RollupNavigation]]'s KMV navigation).
    */
  class KmvMergeAggregator(val k: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    private val base = new KmvAggregator(k)
    override def zero: Array[Long] = Array.empty[Long]
    override def reduce(buf: Array[Long], in: Array[Long]): Array[Long] =
      if (in == null) buf else base.merge(buf, in)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      base.merge(a, b)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
  }

  /** Merge a column of stored k-minima arrays (see [[KmvMergeAggregator]]). */
  def mergeMinima(minimaCol: Column, k: Int): Column =
    udaf(new KmvMergeAggregator(k), ExpressionEncoderHelper.arrayLong).apply(minimaCol)

  private[graft] object ExpressionEncoderHelper {
    val arrayLong: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The k minima of `hashCol` (a Long hash column) as an aggregate
    * Column; pair with [[Hashing.md5Long]] for cross-engine determinism.
    */
  def kMinima(hashCol: Column, k: Int): Column =
    udaf(new KmvAggregator(k), Encoders.scalaLong).apply(hashCol)

  /** Hash domain size for [[Hashing.md5Long]] (60-bit). */
  val Domain: Double = 1152921504606846976.0 // 2^60, exactly representable

  /** Distinct-count estimate from the k-minima array: (k-1) * D / h_k.
    * Null (group has fewer than k distinct values) propagates — callers
    * fall back to the exact count below the sketch's resolution.
    */
  def estimate(minima: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    round(lit((k - 1).toDouble) * lit(Domain) /
      try_element_at(minima, lit(k)).cast("double")).cast("long")
  }
}
