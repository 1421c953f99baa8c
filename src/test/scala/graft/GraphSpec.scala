package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** PageRank: exact integer semantics against a hand-computed reference,
  * partitioning invariance, dangling-mass behavior.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Local integer replica of Graph.pagerank (same floorDiv arithmetic). */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = nodes.map(_ -> Graph.Scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        Math.floorDiv(rank(s) * 850L, 1000L * deg(s))
      }.sum).toMap
      rank = nodes.map(n => n -> (150000L + in.getOrElse(n, 0L))).toMap
    }
    rank
  }

  private val diamond = Seq[(Long, Long)](
    (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 1L))

  test("pagerank == the hand-rolled integer reference, any partitioning") {
    for (iters <- Seq(1, 3); parts <- Seq(1, 7)) {
      val got = Graph.pagerank(diamond.toDF("src", "dst").repartition(parts), iters)
        .as[(Long, Long)].collect().toMap
      graft.ops.CacheRegistry.drain()
      assert(got === reference(diamond, iters), s"iters=$iters parts=$parts")
    }
  }

  test("tolPpm early-stops a converged graph; result matches the fixed-iters run") {
    // a ring is 1-regular: every node's round-1 rank is base + floor(d·Scale)
    // = Scale again, so Δ = 0 after one round — exact-integer convergence
    val ring = (0L until 6L).map(k => (k, (k + 1) % 6))
    val (df, rounds) = Graph.pagerankWithRounds(
      ring.toDF("src", "dst"), iters = 8, tolPpm = 1L)
    val got = df.as[(Long, Long)].collect().toMap
    graft.ops.CacheRegistry.drain()
    assert(rounds === 1, "expected early exit on the converged ring")
    assert(got === reference(ring, 8)) // fixed-point: any iters agree
    // non-converged fixture: diamond ranks still move at round 2, so the
    // same tolerance runs past round 1 and matches the fixed-iters result
    val (df2, rounds2) = Graph.pagerankWithRounds(
      diamond.toDF("src", "dst"), iters = 3, tolPpm = 1L)
    val got2 = df2.as[(Long, Long)].collect().toMap
    graft.ops.CacheRegistry.drain()
    assert(rounds2 > 1)
    assert(got2 === reference(diamond, rounds2))
  }

  test("symmetric mode == general mode == reference on a symmetrized graph") {
    // symmetric=true drops the node-universe distinct and the per-round
    // dangling backfill join (r16) — valid exactly when every node occurs
    // as both src and dst. Pin both paths equal to each other and to the
    // integer reference on a symmetrized irregular graph.
    val asym = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (1L, 3L), (5L, 1L))
    val sym = (asym ++ asym.map(_.swap)).distinct
    for (iters <- Seq(1, 3)) {
      val g1 = Graph.pagerank(sym.toDF("src", "dst"), iters, symmetric = true)
        .as[(Long, Long)].collect().toMap
      graft.ops.CacheRegistry.drain()
      val g2 = Graph.pagerank(sym.toDF("src", "dst"), iters)
        .as[(Long, Long)].collect().toMap
      graft.ops.CacheRegistry.drain()
      assert(g1 === g2, s"iters=$iters")
      assert(g1 === reference(sym, iters), s"iters=$iters")
    }
  }

  test("hub accumulates rank; dangling sink keeps only teleport mass downstream") {
    // star into 4, plus 5 dangling (receives from 4, emits nothing)
    val edges = Seq[(Long, Long)]((1L, 4L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = Graph.pagerank(edges.toDF("src", "dst"), iters = 2)
      .as[(Long, Long)].collect().toMap
    graft.ops.CacheRegistry.drain()
    assert(got === reference(edges, 2))
    assert(got(4L) > got(1L)) // hub beats leaves
    // leaves get no in-mass: exactly the teleport base after any round
    assert(got(1L) === 150000L)
  }

  test("materialized kNN edges: graph-kernel plans are ANN-build-free") {
    // the materialize-once contract: triangles / clustering-coef consume
    // the parquet edge artifact — no k-means training, no embedding scan,
    // no cosine scoring machinery anywhere in the consumer plan
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q_graph_triangles", "q_graph_clustering_coef")) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_knn_edges_"), s"$q: $plan")
      assert(!plan.contains("embeddings"), s"$q: $plan")
      assert(!plan.toLowerCase.contains("aggregate_dot"), s"$q: $plan")
      graft.ops.CacheRegistry.drain()
    }
    // and the artifact is edge-shaped: undirected (a < b), deduplicated
    val e = spark.read.parquet(
      graft.queries.PipelineQueries.knnEdgesArtifact(spark, sf))
    assert(e.columns.toSeq === Seq("a", "b"))
    import org.apache.spark.sql.functions.col
    assert(e.filter(col("a") >= col("b")).count() === 0)
    assert(e.distinct().count() === e.count())
  }
}
