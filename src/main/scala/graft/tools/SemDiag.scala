package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{CacheRegistry, Similarity}
import graft.sources.Tables

/** Throwaway diagnostic: candidate-pair volume of the semantic kernel at
  * p=1/p=2 for a given fixture dir (not part of the engine surface).
  */
object SemDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val em = Tables.embeddings(spark, dir)
    val n = em.count()
    val k = Similarity.deriveK(n)
    val t0 = System.nanoTime()
    val cents = Similarity.kmeansTrain(em, "vec_id", "embedding", k = k, iters = 2)
    val tTrain = (System.nanoTime() - t0) / 1e9
    for (p <- Seq(1, 2)) {
      val t1 = System.nanoTime()
      val m = Similarity.assignWithCentroidsTopP(em, "vec_id", "embedding",
        cents.toSeq, p)
        .withColumn("nrm", aggregate(transform(col("q"), x => x * x),
          lit(0L), (acc, x) => acc + x))
        .filter(col("nrm") > 0L).select("cell", "id", "q", "nrm")
      val cellSizes = m.groupBy("cell").count().agg(
        sum(col("count") * col("count")), max("count"), count(lit(1))).head()
      val nCand = Similarity.cellPairsCapped(m).count()
      val tP = (System.nanoTime() - t1) / 1e9
      println(s"DIAG dir=$dir n=$n k=$k p=$p train=${tTrain}s " +
        s"sumSq=${cellSizes.get(0)} maxCell=${cellSizes.get(1)} " +
        s"nonEmptyCells=${cellSizes.get(2)} candidates=$nCand pairsSec=$tP")
      CacheRegistry.drain()
    }
    spark.stop()
  }
}
