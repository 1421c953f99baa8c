package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a MERGEABLE AGGREGATE — the scale-right alternative
  * to `row_number() OVER (PARTITION BY g ORDER BY v)` for per-group
  * top-k.
  *
  * The window form sorts EVERY row of every group behind one shuffle
  * (at 100 TB: a full-data sort whose only surviving output is k rows
  * per group); this aggregator keeps a sorted ≤k array per group, so
  * partial aggregation runs map-side and only O(k) state per group
  * crosses the shuffle — the same partial+final discipline as the
  * engine's sketch family, but exact. `TakeOrderedAndProject` is
  * Spark's built-in version of this idea for GLOBAL top-k; this is the
  * grouped version the built-in surface lacks.
  *
  * Ordering: value DESC, ties to the SMALLEST id (deterministic for
  * unique ids — the same (v, id) tie rule every ranked query in the
  * engine uses, so a `row_number` oracle reproduces the selection
  * exactly). Values and ids are Longs: callers quantize (e.g. money to
  * cents) first, which is also what keeps the oracle hash-exact.
  */
object TopK {

  class TopKAggregator(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    require(k > 0, s"k must be positive: $k")

    override def zero: Seq[(Long, Long)] = Vector.empty

    // buffer invariant: sorted by (value desc, id asc), length <= k
    private def better(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def reduce(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] = {
      if (buf.length >= k && !better(x, buf.last)) buf
      else {
        val ins = buf.indexWhere(e => better(x, e)) match {
          case -1 => buf.length
          case i => i
        }
        (buf.take(ins) :+ x) ++ buf.drop(ins).take(k - ins - 1)
      }
    }

    override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      // merge two sorted runs, keep the best k
      val out = Vector.newBuilder[(Long, Long)]
      var i = 0
      var j = 0
      var n = 0
      while (n < k && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && better(a(i), b(j)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Top-k (value, id) pairs of a group as one aggregate Column — an
    * array of (_1 = value, _2 = id) structs sorted best-first. Explode
    * with `posexplode` for ranked rows.
    */
  def topK(valueCol: Column, idCol: Column, k: Int): Column =
    udaf(new TopKAggregator(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(valueCol, idCol)
}
