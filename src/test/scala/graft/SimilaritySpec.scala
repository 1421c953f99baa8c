package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Similarity search: quantized cosine, kernel/declarative agreement,
  * top-k, sign-LSH buckets.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-embeddings, dim 8
  private def vecs: org.apache.spark.sql.DataFrame = {
    def v(seed: Int): Array[Float] =
      Array.tabulate(8)(k => (math.sin(seed * 31 + k * 7).toFloat))
    (Seq((0L, v(1)), (1L, v(1).map(x => x * 2.0f)), // colinear with 0
      (2L, v(2)), (3L, v(3)), (4L, v(1).map(-_))) // anti-colinear
      ).toDF("vec_id", "embedding")
  }

  test("kernel and declarative cosine pairs agree exactly") {
    val a = Similarity.cosinePairs(vecs, "vec_id", "embedding", tau = -1.1, dim = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val b = Similarity.cosinePairsKernel(vecs, "vec_id", "embedding", tau = -1.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(a.keySet === b.keySet)
    a.keySet.foreach(k => assert(a(k) === b(k), s"pair $k"))
    assert(a((0L, 1L)) > 0.9999) // colinear
    assert(a((0L, 4L)) < -0.9999) // anti-colinear
  }

  test("blocked kernel pairs == declarative pairs (no driver collect)") {
    val a = Similarity.cosinePairs(vecs, "vec_id", "embedding", tau = -1.1, dim = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // blocks=3 over 5 vectors exercises same-block triangles AND cross-block
    // rectangles, including a singleton block
    val b = Similarity.cosinePairsBlocked(vecs, "vec_id", "embedding",
      tau = -1.1, blocks = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(a === b)
    // auto-derived block count (blocks <= 0) must give identical results
    val c = Similarity.cosinePairsBlocked(vecs, "vec_id", "embedding", tau = -1.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(a === c)
  }

  test("deriveBlocks scales with corpus size and respects both floors") {
    val kb = 1L << 10; val mb = 1L << 20
    // parallelism floor binds on small corpora: ceil(sqrt(2*32)) = 8
    assert(Similarity.deriveBlocks(5000, 536.0, 32, 64 * mb) === 8)
    // memory ceiling binds as the corpus grows: block rows stay <= 64 MB
    val big = Similarity.deriveBlocks(1000000000L, 536.0, 32, 64 * mb)
    assert(big === math.ceil(1000000000L * 536.0 / (64 * mb)).toInt)
    assert(big > 7000) // ~536 GB corpus -> thousands of blocks
    // monotone in corpus size; never below 1
    assert(Similarity.deriveBlocks(0, 0.0, 1, 64 * mb) === 2)
    assert(Similarity.deriveBlocks(100, 512.0, 1, 50 * kb) >= 2)
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak, excludes self") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 4)
      .orderBy("rnk").collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("cand_id"), r.getAs[Double]("cos")))
    assert(out.length === 4)
    assert(out(0)._2 === 1L) // colinear neighbor first
    assert(out.map(_._3).toSeq === out.map(_._3).sorted(Ordering[Double].reverse).toSeq)
    assert(!out.exists(_._2 == 0L))
  }

  test("signBucket groups sign-compatible vectors; colinear share a bucket") {
    val dims = Seq(1, 3, 5, 7)
    val got = vecs.select(col("vec_id"),
        Similarity.signBucket(col("embedding"), dims).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === got(1L)) // scaling preserves signs
    assert(got(0L) !== got(4L)) // negation flips every sign bit
    assert(got(4L) === (~got(0L) & 0xFL))
  }

  test("lshTopK returns within-bucket neighbors only") {
    val out = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 5, dims = Seq(1, 3, 5, 7))
      .collect().map(_.getAs[Long]("cand_id")).toSet
    assert(out.contains(1L))  // same bucket (colinear)
    assert(!out.contains(4L)) // different bucket (anti-colinear)
  }
}
