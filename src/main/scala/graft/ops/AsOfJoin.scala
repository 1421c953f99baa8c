package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the payload of the single most
  * recent right row with `right.ts <= left.ts` for the same key (ties:
  * the right row at the exact same instant wins).
  *
  * Spark has no native ASOF JOIN. The naive range join
  * (`l.key = r.key AND l.ts >= r.ts` + keep-latest) degenerates to
  * O(|l| x |r|) per key in a BroadcastNestedLoop/cartesian plan. This
  * implementation is the union+window formulation: interleave both sides
  * on (key, ts), carry the latest right payload forward with a running
  * `last(_, ignoreNulls)` window, keep left rows — ONE shuffle on the key,
  * one sort, strictly linear in |l| + |r|. At 100 TB both sides shuffle
  * once on the join key; a skewed key needs salting the window partition
  * (key, saltOf(ts-range)) exactly like any windowed aggregation.
  */
object AsOfJoin {

  /** @param payload right-side columns to attach (suffixed `_asof`).
    *
    * The payload rides in ONE struct column (null exactly for left-side
    * padding rows): carrying each payload column separately through
    * `last(_, ignoreNulls)` would let a legitimately-NULL payload value in
    * the matched right row be "seen through" to an older right row, and
    * could mix columns from different right rows. The struct is atomic —
    * all attached values come from the same (latest) right row, and a
    * right row whose payload values are all NULL still matches.
    * Right rows at the exact same (key, ts) are mutually unordered (any
    * one of them wins) — the same nondeterminism as native ASOF joins.
    */
  def asOf(left: DataFrame, right: DataFrame,
           key: String, leftTs: String, rightTs: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)

    val l = left.select(
      (leftCols.map(col) :+ lit(1).as("__side")) :+
        lit(null).cast(right.select(payloadStruct).schema.head.dataType)
          .as("__asof"): _*)
    val r = right.select(
      (leftCols.map {
        case c if c == key => col(key)
        case c if c == leftTs => col(rightTs).cast(left.schema(leftTs).dataType).as(leftTs)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      } :+ lit(0).as("__side")) :+ payloadStruct.as("__asof"): _*)

    // order right rows BEFORE left rows at the same timestamp so an exact-
    // tie right row is visible to the left row (<= semantics)
    val w = Window.partitionBy(col(key))
      .orderBy(col(leftTs).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__asof_last", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__asof_last.$c").as(s"${c}_asof")): _*)
  }
}
