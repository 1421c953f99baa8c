package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{CacheRegistry, Dedup, Similarity}
import graft.sources.Tables

/** Throwaway diagnostic: stage attribution of the FUSED semantic
  * pair→cluster path (q_dedup_semantic_clusters) at a given fixture dir —
  * coarse train / two-level tag / spanning-forest emission / LSSS
  * clustering, plus the spanning edge count (the O(corpus) claim in data,
  * beside SemanticDedupSpec's structural ≤ |group|−1 pin). Not part of
  * the engine surface; outputs feed SCALE.md's r16 section.
  *
  * Usage: runMain graft.tools.FusedDiag <fixtureDir> [tau]
  */
object FusedDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tau = if (args.length > 1) args(1).toDouble else 0.44
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def secSince(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    val em = Tables.embeddings(spark, dir)
    val n = em.count()
    val k1 = Similarity.deriveK2(n)

    var t0 = System.nanoTime()
    val cents = Similarity.kmeansTrainSpread(em, "vec_id", "embedding",
      k = k1, iters = 2)
    val tCoarse = secSince(t0)

    t0 = System.nanoTime()
    val tagged = Similarity.hierTagged(em, "vec_id", "embedding",
      cents.toSeq, nprobe1 = 2, k2 = k1, iters2 = 2, nprobe2 = 2)
    val m = CacheRegistry.persist(
      tagged.select(col("cell"), col("id"), col("q"))
        .withColumn("nrm", aggregate(transform(col("q"), x => x * x),
          lit(0L), (acc, x) => acc + x))
        .filter(col("nrm") > 0L)
        .select("cell", "id", "q", "nrm"))
    val nTagged = m.count()
    val tTag = secSince(t0)

    t0 = System.nanoTime()
    val spanning = CacheRegistry.persist(
      Similarity.cellPairsLocalSpanning(m, tau))
    val nEdges = spanning.count()
    val tSpan = secSince(t0)

    t0 = System.nanoTime()
    val labels = Dedup.dedupClusters(spanning, maxRounds = 30)
    val census = labels.groupBy("cluster")
      .agg(count(lit(1)).as("n_members"))
    val Array(nClusters, nLabeled) = census
      .agg(count(lit(1)), sum("n_members")).head() match {
        case r => Array(r.getLong(0), r.getLong(1))
      }
    val tCluster = secSince(t0)

    println(s"FUSEDDIAG dir=$dir n=$n k1=$k1 tau=$tau " +
      f"coarseTrain=$tCoarse%.1fs tagRows=$nTagged tag=$tTag%.1fs " +
      f"spanEdges=$nEdges span=$tSpan%.1fs " +
      f"clusters=$nClusters labeled=$nLabeled cluster=$tCluster%.1fs " +
      f"total=${tCoarse + tTag + tSpan + tCluster}%.1fs")
    CacheRegistry.drain()
    spark.stop()
  }
}
