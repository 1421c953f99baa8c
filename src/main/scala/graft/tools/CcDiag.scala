package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{CacheRegistry, Dedup}

/** Convergence diagnostic for dedupClusters on the REAL kNN edge graph of
  * a fixture dir: builds (or reuses) the edge artifact, then replays the
  * label-propagation + pointer-jump loop printing per-round change counts
  * and min/max label stats — the data the 100× blow-past-30-rounds failure
  * needs root-caused with (simulated path/clique/kNN-band shapes all
  * converge in <= 16 rounds, so the real graph's structure is the open
  * question).
  *
  * Usage: runMain graft.tools.CcDiag <fixtureDir> [maxRounds]
  */
object CcDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val maxRounds = if (args.length > 1) args(1).toInt else 60
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(
      graft.queries.PipelineQueries.knnEdgesArtifact(spark, dir))
      .select(col("a").as("i"), col("b").as("j"))
    val p = CacheRegistry.persist(e.select(col("i").cast("long"), col("j").cast("long")))
    val nE = p.count()
    val edges = CacheRegistry.persist(
      p.select(col("i").as("a"), col("j").as("b"))
        .union(p.select(col("j").as("a"), col("i").as("b"))))
    val nNodes = edges.select("a").distinct().count()
    println(s"CCDIAG edges=$nE nodes=$nNodes")

    var labels = edges.groupBy("a").agg(min(col("b")).as("nmin"))
      .select(col("a"), least(col("a"), col("nmin")).as("label"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val byNeighbor = labels.select(col("a").as("b"), col("label").as("blabel"))
      val neighborMin = edges.join(byNeighbor, "b")
        .groupBy("a").agg(min(col("blabel")).as("nmin"))
      val prop = CacheRegistry.persist(labels.join(neighborMin, Seq("a"), "left")
        .select(col("a"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("plabel"),
          col("label").as("old")))
      val ptr = prop.select(col("a").as("plabel"), col("plabel").as("jlabel"))
      val ckpt = prop.join(ptr, Seq("plabel"), "left")
        .select(col("a"),
          least(col("plabel"), coalesce(col("jlabel"), col("plabel"))).as("label"),
          col("old"))
        .localCheckpoint(true)
      val next = ckpt.sparkSession.createDataFrame(ckpt.rdd, ckpt.schema)
      val changed = next.filter(col("label") =!= col("old")).count()
      val stats = next.agg(countDistinct(col("label")).as("k"),
        count(lit(1)).as("n")).head()
      println(s"CCDIAG round=$round changed=$changed distinctLabels=${stats.getLong(0)} rows=${stats.getLong(1)}")
      converged = changed == 0
      CacheRegistry.release(prop)
      labels = next.select("a", "label")
      round += 1
    }
    println(s"CCDIAG converged=$converged rounds=$round")
    CacheRegistry.drain()
    spark.stop()
  }
}
