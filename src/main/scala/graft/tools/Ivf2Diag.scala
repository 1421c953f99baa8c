package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{CacheRegistry, Similarity}
import graft.sources.Tables

/** Fine-cell census for the two-level IVF at a fixture dir: member and
  * query volumes per fine cell, the Σ members×queries scoring budget, and
  * the top offenders — the data needed to attribute a hot scoring stage
  * to training degeneracy vs probe concentration vs genuine volume.
  * Usage: runMain graft.tools.Ivf2Diag <fixtureDir>
  */
object Ivf2Diag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val em = Tables.embeddings(spark, dir)
    val n = em.count()
    val k1 = Similarity.deriveK2(n)
    var t0 = System.nanoTime()
    val cents = Similarity.kmeansTrainSpread(em, "vec_id", "embedding", k = k1, iters = 2)
    println(f"IVF2DIAG n=$n k1=$k1 train=${(System.nanoTime() - t0) / 1e9}%.1fs")
    t0 = System.nanoTime()
    // coarse census first: is the degeneracy at level 1?
    val coarse = Similarity.probeAssign(em, "vec_id", "embedding", cents.toSeq, 2)
    val cc = CacheRegistry.persist(coarse)
    val coarseCensus = cc.filter(col("rk") === 1).groupBy("cell")
      .agg(count(lit(1)).as("m")).orderBy(col("m").desc).limit(8).collect()
    println("IVF2DIAG coarse top cells (members): " +
      coarseCensus.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" "))
    CacheRegistry.release(cc)
    val tagged = Similarity.hierTagged(em, "vec_id", "embedding", cents.toSeq,
      nprobe1 = 2, k2 = k1, iters2 = 2, nprobe2 = 2)
    val census = CacheRegistry.persist(tagged.groupBy("cell").agg(
      sum(when(col("ism"), 1L).otherwise(0L)).as("m"),
      count(lit(1)).as("q")))
    val tot = census.agg(count(lit(1)).as("cells"),
      sum(col("m") * col("q")).as("work"),
      sum(col("m") * col("m")).as("mm"), max("m"), max("q")).head()
    println(f"IVF2DIAG tag=${(System.nanoTime() - t0) / 1e9}%.1fs " +
      s"fineCells=${tot.getLong(0)} sum_mq=${tot.getLong(1)} " +
      s"sum_mm=${tot.getLong(2)} maxM=${tot.getLong(3)} maxQ=${tot.getLong(4)}")
    census.orderBy((col("m") * col("q")).desc).limit(12).collect().foreach { r =>
      println(s"IVF2DIAG hot fine cell=${r.getLong(0)} m=${r.getLong(1)} q=${r.getLong(2)}")
    }
    CacheRegistry.release(census)

    if (args.length > 1 && args(1) == "recall") {
      // overlap@3 vs exact brute force for a deterministic query sample:
      // the evidence that the two-level speedup is candidate PRUNING at
      // held recall, not neighbor loss. Flat knnGraph measured alongside.
      val nQ = 500L
      val step = math.max(1L, n / nQ)
      val qs = em.filter(pmod(graft.functions.Hashing.md5Long(
        col("vec_id").cast("string")), lit(step)) === 0L)
      val truth = Similarity.bruteForceTopK(em, qs, "vec_id", "embedding", k = 3)
        .select(col("query_id"), col("cand_id"))
      def overlap(graph: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val got = graph.join(qs.select(col("vec_id").as("query_id")), "query_id")
          .select(col("query_id"), col("cand_id"))
        val hit = truth.join(got, Seq("query_id", "cand_id")).count()
        val tot = truth.count()
        println(f"IVF2DIAG recall@3 $name = ${hit.toDouble / tot}%.3f ($hit/$tot)")
      }
      overlap(Similarity.knnGraphHier(em, "vec_id", "embedding", cents.toSeq,
        k = 3, nprobe1 = 2, k2 = k1, iters2 = 2, nprobe2 = 2), "ivf2")
      val flatK = Similarity.deriveK(n)
      val flatCents = Similarity.kmeansTrain(em, "vec_id", "embedding",
        k = flatK, iters = 2)
      overlap(Similarity.knnGraph(em, "vec_id", "embedding", flatCents.toSeq,
        k = 3, nprobe = 2), "flat")
    }
    spark.stop()
  }
}
