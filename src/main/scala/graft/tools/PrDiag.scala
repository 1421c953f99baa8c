package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{CacheRegistry, Graph}
import graft.sources.Tables

/** Round-cost attribution for q_graph_pagerank (the r14 verdict's quiet
  * 6 s reading): times the full query at iters = 1..4 plus the edge-prep
  * stage alone, so fixed overhead separates from per-round cost.
  * Usage: runMain graft.tools.PrDiag [sfDir]
  */
object PrDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def edges() = {
      val li = Tables.lineitem(spark, dir)
        .select((col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      li.union(li.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    }
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PRDIAG $label ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      CacheRegistry.drain(); spark.catalog.clearCache(); System.gc()
    }
    timed("warm")(edges().count())
    timed("edges_only")(edges().count())
    for (it <- Seq(1, 2, 3, 3)) {
      timed(s"pagerank_iters$it") {
        Graph.pagerank(edges(), iters = it)
          .orderBy(col("rank").desc, col("node")).limit(30).count()
      }
    }
    spark.stop()
  }
}
