package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch — the candidate pass of exact
  * distributed heavy hitters.
  *
  * A capacity-`cap` counter table over the stream: increment a present
  * key, insert while there is room, otherwise decrement EVERY counter
  * (dropping zeros) — the classic result (Misra & Gries, "Finding
  * repeated elements", Sci. Comput. Program. 1982) guarantees any item
  * with true frequency > N/(cap+1) survives in the table. Merging two
  * tables sums counts and then subtracts the (cap+1)-th largest combined
  * count from every entry (keeping positives), which preserves the same
  * guarantee under arbitrary merge trees (Agarwal et al., "Mergeable
  * Summaries", PODS'12) — exactly the property a map-side-combined
  * shuffle aggregate needs.
  *
  * The sketch output itself is merge-order-DEPENDENT (surviving counts
  * are undercounts), so no query returns it directly: the engine's
  * heavy-hitters operator treats the keys as a CANDIDATE SET — a
  * guaranteed superset of the true heavy hitters, at most `cap` entries —
  * and recounts them exactly in a second broadcast-semi-joined pass.
  * Candidates ⊇ truth plus exact recount plus the threshold filter makes
  * the final answer deterministic and equal to the naive full-vocabulary
  * GROUP BY, while only O(cap) state ever crosses the shuffle in pass 1
  * and only candidate rows (≤ cap × groups) aggregate in pass 2. At
  * 100 TB that is the difference between shuffling a billion-entry
  * vocabulary and shuffling a few-KiB table per group.
  */
object MisraGries {

  /** Typed aggregator: counter table keyed by item, ≤ cap entries. */
  class MgAggregator(cap: Int) extends Aggregator[String, Map[String, Long], Array[String]] {
    require(cap >= 1, s"cap=$cap must be >= 1")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], w: String): Map[String, Long] =
      buf.get(w) match {
        case Some(c) => buf.updated(w, c + 1L)
        case None if buf.size < cap => buf.updated(w, 1L)
        case None =>
          // decrement-all: the arriving item and one unit of every counter
          // annihilate; zeros leave the table, freeing room
          buf.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (summed.size <= cap) summed
      else {
        // subtract the (cap+1)-th largest count from all, keep positives:
        // at most cap survive, and any item with combined count above the
        // merged error bound still survives (mergeable-summaries lemma)
        val kth = summed.valuesIterator.toArray.sortBy(-_).apply(cap)
        summed.flatMap { case (k, c) => if (c > kth) Some(k -> (c - kth)) else None }
      }
    }

    override def finish(buf: Map[String, Long]): Array[String] = buf.keys.toArray.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** Candidate heavy hitters of `itemCol` (sorted, ≤ cap entries) as an
    * aggregate Column — a guaranteed superset of every item with
    * frequency > N/(cap+1) in the group.
    */
  def candidates(itemCol: Column, cap: Int): Column =
    udaf(new MgAggregator(cap), Encoders.STRING).apply(itemCol)
}
