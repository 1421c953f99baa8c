package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{CacheRegistry, Dedup, Similarity}
import graft.sources.Tables

/** LSSS convergence reading on the kNN graph of a fixture dir (r14 verdict
  * #2's missing rung: the 2M-vector graph): builds the top-3 kNN edge set
  * with the TWO-LEVEL index (the scale-path builder — flat IVF at 2M is
  * the N^1.5 curve this round retires), folds it undirected, runs
  * [[Dedup.dedupClusters]], and prints rounds / wall time / component
  * census. Usage: runMain graft.tools.CcRounds <fixtureDir> [maxRounds]
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val maxRounds = if (args.length > 1) args(1).toInt else 30
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val em = Tables.embeddings(spark, dir)
    val n = em.count()
    val k1 = Similarity.deriveK2(n)
    val t0 = System.nanoTime()
    val cents = Similarity.kmeansTrain(em, "vec_id", "embedding", k = k1, iters = 2)
    val edges = Similarity.knnGraphHier(em, "vec_id", "embedding", cents.toSeq,
        k = 3, nprobe1 = 2, k2 = k1, iters2 = 2, nprobe2 = 2)
      .filter(col("query_id") =!= col("cand_id"))
      .select(least(col("query_id"), col("cand_id")).as("i"),
        greatest(col("query_id"), col("cand_id")).as("j"))
      .distinct()
    val p = CacheRegistry.persist(edges)
    val nE = p.count()
    val tGraph = (System.nanoTime() - t0) / 1e9
    println(f"CCROUNDS n=$n k1=$k1 edges=$nE graph_build=$tGraph%.1fs")

    val t1 = System.nanoTime()
    val labels = Dedup.dedupClusters(p, maxRounds)
    val census = labels.agg(count(lit(1)).as("nodes"),
      countDistinct(col("cluster")).as("clusters")).head()
    val tCc = (System.nanoTime() - t1) / 1e9
    println(f"CCROUNDS rounds=${Dedup.lastRounds.get()} cc_sec=$tCc%.1f " +
      s"nodes=${census.getLong(0)} clusters=${census.getLong(1)}")
    spark.stop()
  }
}
