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

  // 16 deterministic vectors, dim 8 — enough to seed k=2 codebooks and
  // exercise tie/ordering rules in the PQ pipeline
  private def pqVecs: org.apache.spark.sql.DataFrame =
    (0L until 16L).map(i =>
      (i, Array.tabulate(8)(k => math.sin(i * 13 + k * 7).toFloat)))
      .toDF("vec_id", "embedding")

  test("pqCode: codes are the exact per-subspace integer-L2 argmin") {
    val books = Similarity.pqTrain(pqVecs, "vec_id", "embedding",
      m = 2, k = 2, iters = 2, dim = 8)
    assert(books.length === 2 && books.forall(_.length === 2))
    assert(books.forall(_.forall(_._2.length === 4)))
    val cents = books.map(_.sortBy(_._1).map(_._2))
    val quant = pqVecs.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val got = Similarity.pqCode(pqVecs, "vec_id", "embedding", books, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    quant.foreach { case (id, v) =>
      val expect = (0 until 2).map { s =>
        val ds = cents(s).map { cv =>
          (0 until 4).map(i => { val t = v(s * 4 + i) - cv(i); t * t }).sum
        }
        ds.indexOf(ds.min) // first minimum = lowest cid (sorted order)
      }
      assert(got(id).toSeq === expect, s"vec $id")
    }
  }

  test("pqTrain (threaded subspaces) == sequential per-subspace kmeansTrain") {
    // pqTrain overlaps its m independent Lloyd chains on a thread pool
    // (r16 optimization); each chain must stay bit-identical to running
    // kmeansTrain on that subspace slice by itself, in order.
    val books = Similarity.pqTrain(pqVecs, "vec_id", "embedding",
      m = 2, k = 2, iters = 2, dim = 8)
    val seq = (0 until 2).map { s =>
      Similarity.kmeansTrain(pqVecs.select(col("vec_id"),
          slice(col("embedding"), s * 4 + 1, 4).as("__sub")),
        "vec_id", "__sub", k = 2, iters = 2, dim = 4)
    }
    assert(books.length === seq.length)
    (books zip seq).foreach { case (b, e) =>
      assert(b.map(_._1).toSeq === e.map(_._1).toSeq)
      (b zip e).foreach { case ((_, bv), (_, ev)) =>
        assert(bv.toSeq === ev.toSeq)
      }
    }
  }

  test("pqSearchTopK == driver-side ADC brute force (exact distributed top-k)") {
    val books = Similarity.pqTrain(pqVecs, "vec_id", "embedding",
      m = 2, k = 2, iters = 2, dim = 8)
    val cents = books.map(_.sortBy(_._1).map(_._2))
    val quant = pqVecs.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("q"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val coded = Similarity.pqCode(pqVecs, "vec_id", "embedding", books, dim = 8)
    val codeMap = coded.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val queries = quant.filter(_._1 < 3)
    val got = Similarity
      .pqSearchTopK(coded, queries, books, k = 4, dim = 8)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // reference: full ADC scan per query, sorted by (adc, id), top 4
    queries.foreach { case (qid, qv) =>
      val ref = quant.filter(_._1 != qid).map { case (id, _) =>
        val codes = codeMap(id)
        val adc = (0 until 2).map { s =>
          val cv = cents(s)(codes(s))
          (0 until 4).map(i => { val t = qv(s * 4 + i) - cv(i); t * t }).sum
        }.sum
        (adc, id)
      }.sortBy(identity).take(4)
      ref.zipWithIndex.foreach { case ((adc, id), p) =>
        assert(got((qid, p + 1L)) === ((id, adc)), s"query $qid rank ${p + 1}")
      }
    }
  }

  test("knnGraph == ivfTopK with the whole corpus as queries, bit for bit") {
    val cents = Similarity.kmeansTrain(pqVecs, "vec_id", "embedding",
      k = 3, iters = 2, dim = 8)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    val declarative = keyed(Similarity.ivfTopK(pqVecs, pqVecs,
      "vec_id", "embedding", k = 2, nCentroids = 3, nprobe = 2,
      trainedCentroids = Some(cents.toSeq)))
    val kernel = keyed(Similarity.knnGraph(pqVecs, "vec_id", "embedding",
      cents.toSeq, k = 2, nprobe = 2))
    assert(kernel === declarative)
    assert(kernel.nonEmpty)
  }

  test("knnGraphHier with ONE coarse cell == flat knnGraph, bit for bit") {
    // with a single coarse cell every vector is a member and every query
    // probes it, so the fine level IS the whole index: local Lloyd over
    // all members (seeds = k2 lowest ids, L2 ties-to-lowest, floorDiv
    // means) must replicate kmeansTrain exactly, and the cosine
    // membership/probe/scoring rules must replicate knnGraph's — any
    // drift in the per-cell kernel breaks exact equality here
    val one = Seq((0L, Array.fill(8)(1L)))
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    val flatCents = Similarity.kmeansTrain(pqVecs, "vec_id", "embedding",
      k = 3, iters = 2, dim = 8)
    val flat = keyed(Similarity.knnGraph(pqVecs, "vec_id", "embedding",
      flatCents.toSeq, k = 2, nprobe = 2))
    // spreadSeeds off: the flat kmeansTrain contract is lowest-id seeds,
    // so the replication pin must run the fine Lloyd under the same rule
    val hier = keyed(Similarity.knnGraphHier(pqVecs, "vec_id", "embedding",
      one, k = 2, nprobe1 = 1, k2 = 3, iters2 = 2, nprobe2 = 2,
      spreadSeeds = false))
    assert(hier === flat)
    assert(hier.nonEmpty)
  }

  test("knnGraphHier refuses a fine map over the broadcast budget, naming sharding") {
    // the guard is the deriveK2 ceiling made executable: a production-dim
    // corpus near the 1024² cap would broadcast multi-GB per executor —
    // the engine must refuse with the scale-out step in the message, not
    // OOM a fleet. 64 bytes is under any real fine map.
    val coarse = Similarity.kmeansTrain(pqVecs, "vec_id", "embedding",
      k = 2, iters = 1, dim = 8)
    val e = intercept[IllegalArgumentException] {
      Similarity.knnGraphHier(pqVecs, "vec_id", "embedding", coarse.toSeq,
        k = 2, nprobe1 = 1, k2 = 2, iters2 = 1, nprobe2 = 1,
        fineBroadcastBudget = 64L).count()
    }
    assert(e.getMessage.contains("index sharding"))
    // at the default budget the same build serves fine
    assert(Similarity.knnGraphHier(pqVecs, "vec_id", "embedding", coarse.toSeq,
      k = 2, nprobe1 = 1, k2 = 2, iters2 = 1, nprobe2 = 1).count() > 0)
  }

  test("knnGraphHierSharded: one shard == the unsharded index; two shards keep the contract and cross-shard candidacy") {
    val big = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(k => math.sin(i * 13 + k * 7).toFloat)))
      .toDF("vec_id", "embedding")
    // nShards = 1 is the unsharded index built the same way (deriveK2 on
    // the full count, spread-seed coarse train, same serve) — differential
    val k1 = Similarity.deriveK2(60)
    val cents = Similarity.kmeansTrainSpread(big, "vec_id", "embedding",
      k = k1, iters = 2, dim = 8)
    val unsharded = Similarity.knnGraphHier(big, "vec_id", "embedding",
      cents.toSeq, k = 3, nprobe1 = 2, k2 = k1, iters2 = 2, nprobe2 = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val one = Similarity.knnGraphHierSharded(big, "vec_id", "embedding",
      nShards = 1, k = 3, nprobe1 = 2, iters2 = 2, nprobe2 = 2, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(one === unsharded)
    graft.ops.CacheRegistry.drain()
    // two shards: per-query contract (dense rnk, cos non-increasing, no
    // self rows) AND the cross-shard serve actually fires — odd vectors
    // must appear as candidates of even queries or vice versa, which only
    // happens through the query-only probeAssignQ path
    val two = Similarity.knnGraphHierSharded(big, "vec_id", "embedding",
      nShards = 2, k = 3, nprobe1 = 2, iters2 = 2, nprobe2 = 2, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(two.nonEmpty)
    val byQ = two.groupBy(_._1)
    assert(byQ.keySet.size === 60, "every vector is a query")
    byQ.values.foreach { rows =>
      assert(rows.length <= 3)
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq)
      rows.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4)
        case _ =>
      }
    }
    two.foreach { case (q, _, c, _) => assert(q != c) }
    assert(two.exists { case (q, _, c, _) => q % 2 != c % 2 },
      "cross-shard candidacy never fired")
    graft.ops.CacheRegistry.drain()
  }

  test("knnGraphHier multi-cell: per-query contract holds and every cos is the exact cosine") {
    val big = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(k => math.sin(i * 13 + k * 7).toFloat)))
      .toDF("vec_id", "embedding")
    val coarse = Similarity.kmeansTrain(big, "vec_id", "embedding",
      k = 4, iters = 2, dim = 8)
    val got = Similarity.knnGraphHier(big, "vec_id", "embedding",
      coarse.toSeq, k = 3, nprobe1 = 2, k2 = 3, iters2 = 2, nprobe2 = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet.size === 60, "every vector is a query")
    byQ.values.foreach { rows =>
      assert(rows.length <= 3)
      val rnks = rows.map(_._2).sorted
      assert(rnks.toSeq === (1L to rows.length).toSeq, "rnk is dense from 1")
      // rnk order follows cos desc — compared on the ROUNDED output, so
      // only non-increase is checkable (rnk was assigned pre-rounding:
      // two rows equal at 4dp may order by their unrounded values)
      val ord = rows.sortBy(_._2)
      ord.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4)
        case _ =>
      }
    }
    // reported cos@4dp equals the exact quantized cosine, and no self rows
    val quant = big.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def cosOf(a: Long, b: Long): Double = {
      val (va, vb) = (quant(a), quant(b))
      val dot = (0 until 8).map(i => va(i) * vb(i)).sum
      val na = math.sqrt((0 until 8).map(i => va(i) * va(i)).sum.toDouble)
      val nb = math.sqrt((0 until 8).map(i => vb(i) * vb(i)).sum.toDouble)
      math.rint(dot.toDouble / (na * nb) * 1e4) / 1e4
    }
    got.foreach { case (qid, _, cid, c) =>
      assert(qid != cid, "self rows excluded")
      assert(c === cosOf(qid, cid), s"cos($qid,$cid)")
    }
  }

  test("ivfPqTopK == ADC brute force restricted to the probed cells") {
    val fullCents = Similarity.kmeansTrain(pqVecs, "vec_id", "embedding",
      k = 3, iters = 2, dim = 8)
    val books = Similarity.pqTrain(pqVecs, "vec_id", "embedding",
      m = 2, k = 2, iters = 2, dim = 8)
    val cbooks = books.map(_.sortBy(_._1).map(_._2))
    val quant = pqVecs.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("q"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val codeMap = Similarity.pqCode(pqVecs, "vec_id", "embedding", books, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def l2(a: Array[Long], b: Array[Long], off: Int): Long =
      (0 until b.length).map(i => { val t = a(off + i) - b(i); t * t }).sum
    def cellOf(v: Array[Long]): Long =
      fullCents.map { case (cid, cv) => (l2(v, cv, 0), cid) }.min._2
    val queries = quant.filter(_._1 < 3)
    val got = Similarity.ivfPqTopK(pqVecs, "vec_id", "embedding",
        fullCents.toSeq, books, queries, k = 4, nprobe = 2, dim = 8)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val vecOf = quant.toMap
    queries.foreach { case (qid, qv) =>
      val probes = fullCents.map { case (cid, cv) => (l2(qv, cv, 0), cid) }
        .sorted.take(2).map(_._2).toSet
      val ref = quant
        .filter { case (id, v) => id != qid && probes.contains(cellOf(v)) }
        .map { case (id, _) =>
          val codes = codeMap(id)
          val adc = (0 until 2).map(s => l2(qv, cbooks(s)(codes(s)), s * 4)).sum
          (adc, id)
        }.sortBy(identity).take(4)
      ref.zipWithIndex.foreach { case ((adc, id), p) =>
        assert(got((qid, p + 1L)) === ((id, adc)), s"query $qid rank ${p + 1}")
      }
      // pruning is real: candidates outside the probe set never appear
      val gotIds = got.collect { case ((q2, _), (id, _)) if q2 == qid => id }
      gotIds.foreach(id => assert(probes.contains(cellOf(vecOf(id)))))
    }
  }
}
