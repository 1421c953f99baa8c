package graft

import org.apache.spark.sql.functions._
import graft.functions.TopK

/** Map-side top-k aggregate: equality with the window-rank selection
  * under forced partial/merge, tie rule, small-group behavior.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topK == row_number window selection, any partitioning, ties to low id") {
    // values collide on purpose: (g, v) pairs with duplicate v exercise
    // the (v desc, id asc) tie rule
    val rows = for (g <- 0 until 3; i <- 0 until 40)
      yield (g.toLong, ((i * 7) % 10).toLong, (g * 100 + i).toLong)
    val df = rows.toDF("g", "v", "id").repartition(7) // force merges
    val agg = df.groupBy("g").agg(TopK.topK(col("v"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rnk"),
        col("col._1").as("v"), col("col._2").as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("id"))
    val ref = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select("g", "rnk", "v", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(agg.sorted.toSeq === ref.sorted.toSeq)
  }

  test("groups smaller than k return all members, still ordered") {
    val df = Seq((1L, 9L, 1L), (1L, 3L, 2L)).toDF("g", "v", "id")
    val out = df.groupBy("g").agg(TopK.topK(col("v"), col("id"), 5).as("top"))
      .select(posexplode(col("top"))).select(col("col._1"))
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(9L, 3L))
  }
}
