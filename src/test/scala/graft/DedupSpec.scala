package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dedup family: shingling, exact, Jaccard, MinHash+LSH, SimHash. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e f"),
    (2L, "a b c d e f"),            // exact dup of 1
    (3L, "a b c d e g"),            // near dup of 1 (one token changed)
    (4L, "x y z w q r"),            // unrelated
    (5L, "ab"))                     // shorter than one shingle
    .toDF("doc_id", "text")

  test("shingles: sliding distinct 3-grams; short docs yield none") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val d1 = sh.filter(_._1 == 1L).map(_._2).toSet
    assert(d1 === Set("a b c", "b c d", "c d e", "d e f"))
    assert(!sh.exists(_._1 == 5L))
  }

  test("exact dedup groups identical content, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("kept_id") === 1L)
    assert(out(0).getAs[Long]("n_copies") === 2L)
  }

  test("jaccardPairs finds exact and near duplicates above tau") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.4)
      .collect().map(r => ((r.getAs[Long]("i"), r.getAs[Long]("j")),
        r.getAs[Double]("jac"))).toMap
    assert(pairs.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs((1L, 2L)) === 1.0)            // identical sets
    assert(pairs((1L, 3L)) === 0.6)            // 3 shared of 5 union
  }

  test("containmentPairs: sub-document caught directed, Jaccard misses it") {
    // doc 6 is the first half of doc 7: containment(6 in 7) = 1.0 but
    // Jaccard = 4/10 — the asymmetric case the operator exists for.
    val corpus = Seq(
      (6L, "a b c d e f"),
      (7L, "a b c d e f g h i j k l"),
      (8L, "x y z w q r")).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(corpus, "doc_id", "text", n = 3, tau = 0.9)
      .collect().map(r => ((r.getAs[Long]("contained"), r.getAs[Long]("container")),
        r.getAs[Double]("cont"))).toMap
    assert(cont.keySet === Set((6L, 7L)))      // directed: 6 inside 7 only
    assert(cont((6L, 7L)) === 1.0)
    val jac = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, tau = 0.9)
    assert(jac.count() === 0)                  // symmetric metric misses it
  }

  test("containmentPairs: identical docs qualify in both directions") {
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f")).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(corpus, "doc_id", "text", n = 3, tau = 0.9)
      .collect().map(r => (r.getAs[Long]("contained"), r.getAs[Long]("container"))).toSet
    assert(cont === Set((1L, 2L), (2L, 1L)))
  }

  test("maxShingleDF guard drops ubiquitous shingles (blocking recall trade)") {
    val spammy = (1L to 10L).map(i => (i, "common common common common"))
      .toDF("doc_id", "text")
    // 'common common common' appears in all 10 docs; DF cap of 5 removes it
    val pairs = Dedup.jaccardPairs(spammy, "doc_id", "text", n = 3, tau = 0.1,
      maxShingleDF = 5)
    assert(pairs.count() === 0)
  }

  test("minhash LSH finds the planted near-dups with exact-jaccard verify") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3,
      numHashes = 16, bands = 4, tau = 0.4)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    // identical docs ALWAYS collide in every band; near-dups probabilistic
    // but deterministic given the fixed hash family — pin the outcome
    assert(pairs.contains((1L, 2L)))
    assert(pairs.subsetOf(Set((1L, 2L), (1L, 3L), (2L, 3L))))
  }

  test("incremental LSH == full pairs restricted to the delta's newer side") {
    val full = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3,
      numHashes = 16, bands = 4, tau = 0.4)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    val deltaFrom = 2L
    val delta = Dedup.minhashLshPairsDelta(docs, "doc_id", "text", deltaFrom,
      n = 3, numHashes = 16, bands = 4, tau = 0.4)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    assert(delta === full.filter(_._2 >= deltaFrom))
    assert(delta.forall(_._2 >= deltaFrom)) // no old-old pair survives
  }

  test("scan-side direct signatures == aggregate-path signatures, bit for bit") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val viaAgg = Dedup.minhashSignatures(sh, "doc_id", 16)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toSeq).toMap
    val direct = Dedup.minhashSignaturesDirect(docs, "doc_id", "text", 3, 16)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toSeq).toMap
    assert(direct === viaAgg)
  }

  test("simhash (typed scan pass) == the declarative tf/bit-sum form") {
    // r16: the sketch computes shuffle-free in one typed pass; pin it
    // bit-equal to the original explode -> groupBy(id, token) ->
    // 60-bit-sum aggregate it replaced (incl. empty-token tf parity from
    // split's trailing empties and a doc with repeated tokens).
    val fixture = (docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq :+ ((90L, "x x x y  z "))).toDF("doc_id", "text")
    val typed = Dedup.simhash(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tf = fixture.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      .withColumn("h", graft.functions.Hashing.md5Long(col("token")))
    val bitSums = tf.groupBy(col("doc_id")).agg(
      sum(when(shiftright(col("h"), 0).bitwiseAND(lit(1L)) === 1L, col("tf"))
        .otherwise(-col("tf"))).as("b0"),
      (1 until 60).map(i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, col("tf"))
          .otherwise(-col("tf"))).as(s"b$i")): _*)
    val sketch = (0 until 60).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val declarative = bitSums.select(col("doc_id"), sketch.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(typed === declarative)
  }

  test("simhash: identical docs get identical sketches, distance 0") {
    val sk = Dedup.simhash(docs, "doc_id", "text")
    val byId = sk.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) === byId(2L))
    assert(byId(1L) !== byId(4L))
    val pairs = Dedup.simhashPairs(sk, "doc_id", maxDist = 0)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 4L)))
  }

  test("stopShingleFrac guard derives the cap from corpus size") {
    // 'common common common' is in all 10 docs -> df=10 > max(5, 0.2*10)=5,
    // dropped; with it gone no candidate pairs remain.
    val spammy = (1L to 10L).map(i => (i, "common common common common"))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(spammy, "doc_id", "text", n = 3, tau = 0.1,
      stopShingleFrac = 0.2)
    assert(pairs.count() === 0)
    // a rare shingle (df=2 <= cap) survives the guard and still pairs up
    val mixed = spammy.union(Seq(
      (21L, "rare one two three"), (22L, "rare one two three"))
      .toDF("doc_id", "text"))
    val kept = Dedup.jaccardPairs(mixed, "doc_id", "text", n = 3, tau = 0.1,
      stopShingleFrac = 0.2)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    assert(kept === Set((21L, 22L)))
  }

  test("banded simhash pair scan == all-pairs brute force (exactness)") {
    // sketches engineered at graded distances from doc 1's sketch
    val base = java.lang.Long.parseLong("0FFFFFFFFFFFFFF", 16) // 60 bits set... low 56
    val sk = Seq(
      (1L, base), (2L, base ^ 1L), (3L, base ^ 0x31L), // dist 1, dist 3
      (4L, base ^ 0xF0F0F0L), (5L, ~base & ((1L << 60) - 1)))
      .toDF("doc_id", "simhash")
    for (maxDist <- Seq(0, 3, 6, 12)) {
      val banded = Dedup.simhashPairs(sk, "doc_id", maxDist)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Long]("dist"))).toMap
      val brute = sk.as[(Long, Long)].collect().toSeq
        .combinations(2).map(_.sortBy(_._1))
        .map { case Seq((i, si), (j, sj)) => ((i, j), java.lang.Long.bitCount(si ^ sj).toLong) }
        .filter(_._2 <= maxDist).toMap
      assert(banded === brute, s"maxDist=$maxDist")
    }
  }

  test("dedupClusters: chains collapse to one component, min id wins") {
    // chain 1~2, 2~3 (no 1~3 edge) plus the separate pair 10~11: pairwise
    // j-dropping would remove 2 AND 3; clustering keeps one survivor per
    // component
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val got = Dedup.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dedupClusters: pointer jumping converges a path graph in O(log d) rounds") {
    // a 64-node path has diameter 63 — plain min-label propagation needs 63
    // rounds and would blow the default maxRounds; pointer jumping halves
    // label chains each round, so the default converges with room to spare
    val path = (0L until 63L).map(k => (k, k + 1)).toDF("i", "j")
    val got = Dedup.dedupClusters(path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 64)
    assert(got.values.forall(_ == 0L))
  }

  test("dedupClusters: 65536-node path converges in <= 18 rounds (large/small-star)") {
    // the r14 100× stress blew a 30-round cap on a 200k-node kNN graph
    // under min-label propagation + pointer jumping: label chains follow
    // strictly-decreasing id walks that die at local id minima, so on
    // unfavorable id layouts convergence was O(diameter). The alternating
    // large-star/small-star rewrite contracts EDGES geometrically
    // regardless of id placement — simulated rounds: 11 @1k, 14 @8k,
    // 17 @65k on the monotone path (its slowest shape), 11-14 on randomly
    // permuted paths, ~5 on clique/LSH-like graphs.
    val n = 65536L
    val path = spark.range(n - 1).select(col("id").as("i"), (col("id") + 1L).as("j"))
    val got = Dedup.dedupClusters(path, maxRounds = 18)
    assert(got.filter(col("cluster") === 0L).count() === n)
    assert(Dedup.lastRounds.get() <= 18,
      s"rounds=${Dedup.lastRounds.get()}")
    graft.ops.CacheRegistry.drain()
  }

  test("dedupClusters fingerprint convergence: labels == brute union-find, " +
    "self-loop universe backfill intact") {
    // r17 folded the per-round count + exceptAll set-equality probe into
    // the checkpoint-materializing aggregate (count + two xxhash64 XOR
    // folds in one job). Differential pin: random graphs (fixed seeds),
    // an adversarial permuted path, and a self-loop-only doc must all
    // label exactly as a local union-find — premature convergence or a
    // broken universe path would diverge here.
    val rnd = new scala.util.Random(20260819L)
    val shapes: Seq[Seq[(Long, Long)]] = Seq(
      // random sparse graph, 400 nodes / 300 edges
      Seq.fill(300)((rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
        .filter { case (i, j) => i != j },
      // permuted path (the id-layout LSSS worst case family)
      {
        val perm = rnd.shuffle((0L until 257L).toVector)
        (0 until 256).map(k => (perm(k), perm(k + 1)))
      },
      // mixed: two cliques + a self-loop-only doc (universe backfill)
      (for (i <- 0L until 9L; j <- (i + 1) until 9L) yield (i, j)) ++
        Seq((100L, 101L), (101L, 102L), (999L, 999L))
    )
    shapes.foreach { es =>
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (i, j) =>
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      val got = Dedup.dedupClusters(es.toDF("i", "j"), maxRounds = 30)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"edges=${es.take(8)}…")
      graft.ops.CacheRegistry.drain()
    }
  }

  test("q_dedup_simhash plan is a shuffled equi-join — no cartesian scan") {
    val df = graft.SparkEntry.queries("q_dedup_simhash")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("materialized dedup labels: consumer plan is scan + broadcast join, no LSH recompute") {
    val df = graft.SparkEntry.queries("q_dedup_labels_materialized")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // labels come from the parquet artifact...
    assert(plan.contains("graft_dedup_labels_"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // ...not from re-running the shingle/minhash/band pipeline
    assert(!plan.contains("posexplode"), plan)
    assert(!plan.contains("minhash"), plan)
    // and the artifact is duplicate-subset shaped: (doc_id, rep) pairs
    val lab = spark.read.parquet(
      graft.queries.DocQueries.dedupLabelsArtifact(spark, "/root/testdata/sf0.001"))
    assert(lab.columns.toSeq === Seq("doc_id", "rep"))
    assert(lab.count() > 0)
  }

  test("simhash near-dup has small distance, unrelated doc large") {
    val sk = Dedup.simhash(docs, "doc_id", "text")
    val d = Dedup.simhashPairs(sk, "doc_id", maxDist = 60)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Long]("dist"))).toMap
    assert(d((1L, 3L)) < d((1L, 4L)))
  }

  test("adversarial hot band bucket: candidates capped to a connected chain") {
    // 120 identical docs -> identical signatures -> every band has one
    // pathologically hot bucket; unbounded LSH goes quadratic there
    val corpus = ((0 until 120).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta")) ++
      Seq((500L, "completely different text about another topic entirely")))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignaturesDirect(corpus, "doc_id", "text")

    val unbounded = Dedup.lshCandidates(sig, "doc_id", maxBucket = Int.MaxValue).count()
    assert(unbounded === 120L * 119 / 2) // the clique: O(size²)

    val capped = Dedup.lshCandidates(sig, "doc_id", maxBucket = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.length === 119) // the chain: O(size)

    // connectivity preserved: union-find over the capped edges still joins
    // all 120 members into one component (what dedupClusters consumes)
    val parent = scala.collection.mutable.Map(
      (0 until 120).map(i => i.toLong -> i.toLong): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    capped.foreach { case (i, j) => parent(find(i)) = find(j) }
    assert((0 until 120).map(i => find(i.toLong)).toSet.size === 1)

    // chained candidates still pass through the exact-Jaccard verify
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text", maxBucket = 16)
    assert(pairs.count() === 119)
    graft.ops.CacheRegistry.drain()
  }

  test("substringRuns finds the longest verbatim shared run, not just any seed") {
    import graft.ops.Dedup
    // docs 1 and 2 share tokens s0..s20 verbatim (21 tokens) at different
    // offsets; doc 3 shares nothing that long; doc 4 shares two separate
    // 10-token runs with doc 1 (each < one 12-token minRun after chaining
    // only 3 seeds: 8 + 3 - 1 = 10) -> excluded.
    val shared = (0 until 21).map(i => s"s$i").mkString(" ")
    val runA = (0 until 10).map(i => s"a$i").mkString(" ")
    val runB = (0 until 10).map(i => s"b$i").mkString(" ")
    val d = Seq(
      (1L, s"x1 x2 $shared y1 y2 $runA z1 $runB"),
      (2L, s"p1 p2 p3 p4 $shared q1"),
      (3L, "entirely unrelated words all over this document here"),
      (4L, s"m1 $runA m2 m3 $runB m4"))
      .toDF("doc_id", "text")
    val out = Dedup.substringRuns(d, "doc_id", "text",
        gramTokens = 8, minRun = 12, stopGramFrac = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((1L, 2L) -> 21L))
  }

  test("selfDedup keeps first occurrences in order, independent per doc") {
    import graft.ops.Dedup
    val d = Seq(
      (1L, "a b c a b c d e f a b c"),  // segment 'a b c' repeats at idx 0, 1, 3
      (2L, "a b c x y z"))              // same segment in ANOTHER doc is untouched
      .toDF("doc_id", "text")
    val out = Dedup.selfDedup(d, "doc_id", "text", segTokens = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("a b c d e f", 6L, 2L)))
    assert(out(2L) === (("a b c x y z", 6L, 0L)))
  }

  test("boilerplateScrub drops cross-doc hot segments and reassembles in order") {
    val d = Seq(
      (1L, "h1 h2 h3 h4 h5 a b c d e"),  // hot 5-token prefix + unique tail
      (2L, "h1 h2 h3 h4 h5 f g h i j"),
      (3L, "h1 h2 h3 h4 h5"),            // all-boilerplate -> drops out
      (4L, "p q r s t u v"))             // untouched (5 + 2 token segments)
      .toDF("doc_id", "text")
    val out = Dedup.boilerplateScrub(d, "doc_id", "text", segTokens = 5, dfThreshold = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out.keySet === Set(1L, 2L, 4L))
    assert(out(1L) === (("a b c d e", 5L)))
    assert(out(2L) === (("f g h i j", 5L)))
    assert(out(4L) === (("p q r s t u v", 7L)))
  }

  test("boilerplateScrub keeps >10 segments numerically ordered") {
    // 60 unique tokens = 12 segments; a lexicographic seg_idx sort would
    // reorder (10, 11, ...) before 2 — the reassembly must be numeric.
    val text = (0 until 60).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, text), (2L, "unrelated words here")).toDF("doc_id", "text")
    val out = Dedup.boilerplateScrub(d, "doc_id", "text", segTokens = 5, dfThreshold = 2)
      .filter(col("doc_id") === 1L).head()
    assert(out.getString(1) === text)
    assert(out.getLong(2) === 60L)
  }
}
