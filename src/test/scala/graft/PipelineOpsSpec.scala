package graft

import org.apache.spark.sql.functions._
import graft.ops.{Packing, Sampling, Similarity, TextAnalysis => TA}

/** Batch-2 pipeline operators: PII scrubbing, repetition signals,
  * deterministic splits/sampling, sequence packing, int8 quantization,
  * k-means training.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("Ids.contiguous: dense rank ids, any input partitioning, survives coalesce(1)") {
    val rnd = new scala.util.Random(31)
    val keys = rnd.shuffle((0L until 223L).toVector)
    for (parts <- Seq(1, 7)) {
      val df = keys.map(k => (k, s"p$k")).toDF("k", "payload").repartition(parts)
      val out = graft.ops.Ids.contiguous(df, "k", numParts = 5)
        // the Verify harness coalesces before writing — the partition
        // offset must bind to the DEFINING partition, not the running task
        .coalesce(1)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      graft.ops.CacheRegistry.drain()
      assert(out.size === 223)
      // gid == rank in key order, dense 0..N-1
      keys.sorted.zipWithIndex.foreach { case (k, i) =>
        assert(out(k) === i.toLong, s"key $k parts=$parts") }
    }
  }

  test("scrubPii redacts emails, phones, and IPv4s; counts match") {
    val text = "mail bob.smith@corp.example.org now or +1-555-123-4567 " +
      "from 10.1.2.3 and 192.168.0.255 end"
    val out = Seq(text).toDF("t")
      .select(TA.scrubPii(col("t")).as("s"),
        TA.countEmails(col("t")).as("e"),
        TA.countIpv4s(col("t")).as("i"),
        TA.countPhones(col("t")).as("p"))
      .head()
    assert(out.getString(0) ===
      "mail <EMAIL> now or <PHONE> from <IP> and <IP> end")
    assert((out.getInt(1), out.getInt(2), out.getInt(3)) === ((1, 2, 1)))
  }

  test("scrubPii leaves clean text untouched") {
    val clean = "just plain words 1.2 and a half"
    val got = Seq(clean).toDF("t").select(TA.scrubPii(col("t"))).head().getString(0)
    assert(got === clean)
  }

  test("wordNgrams: counts, short-doc empty, no fabricated grams") {
    val rows = Seq("a b c d e", "a b", "solo").toDF("t")
      .select(size(TA.wordNgrams(TA.tokens(col("t")), 3)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(rows === Seq(3, 0, 0))
  }

  test("maxRepeatCount finds the mode count of an array") {
    val got = Seq(
      (Seq("x y", "x y", "z w", "x y"), 3L),
      (Seq("a b"), 1L),
      (Seq.empty[String], 0L))
      .toDF("arr", "want")
      .select(TA.maxRepeatCount(col("arr")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("repetitionStats typed pass == Column HOF form") {
    val df = Seq(
      (0L, "x y x y x y z"),
      (1L, "a b c d e f g h"),
      (2L, "w w w w w w"),
      (3L, "solo"),
      (4L, ""),
      (5L, "a b "), // trailing space: both tokenizers must keep the empty token
      (6L, "a  b")).toDF("doc_id", "text")
    val typed = graft.ops.TextAnalysis.repetitionStats(df, "text")
      .select("doc_id", "n2", "top2", "n5", "d5")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
    val toks = TA.tokens(col("text"))
    val g2 = TA.wordNgrams(toks, 2)
    val g5 = TA.wordNgrams(toks, 5)
    val hof = df.select(col("doc_id"), size(g2).cast("long").as("n2"),
        TA.maxRepeatCount(g2).as("top2"), size(g5).cast("long").as("n5"),
        size(array_distinct(g5)).cast("long").as("d5"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(typed.toSeq === hof.toSeq)
    assert(typed(0) === ((0L, 6L, 3L, 3L, 3L)))
  }

  test("chunkPassages: overlap layout, no redundant tail, short docs") {
    val text10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((0L, text10), (1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .chunkPassages(df, "doc_id", "text", chunkTokens = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // doc 0 (10 tokens, step 2): starts 0,2,4,6 (start 8 adds no new token
    // beyond 8+2=10? 8+2 !< 10 -> stop); chunks of 4, last may be short
    assert(out((0L, 0L)) === ((4L, "w1 w2 w3 w4")))
    assert(out((0L, 1L)) === ((4L, "w3 w4 w5 w6")))
    assert(out((0L, 2L)) === ((4L, "w5 w6 w7 w8")))
    assert(out((0L, 3L)) === ((4L, "w7 w8 w9 w10")))
    assert(!out.contains((0L, 4L)))
    // every token of doc 0 appears in at least one chunk
    val covered = out.collect { case ((0L, _), (_, c)) => c.split(' ') }.flatten.toSet
    assert(covered === (1 to 10).map(i => s"w$i").toSet)
    // 3-token doc -> one short chunk; empty doc -> nothing
    assert(out((1L, 0L)) === ((3L, "a b c")))
    assert(!out.keys.exists(_._1 == 2L))
  }

  test("split is deterministic, complete, and ~80/10/10") {
    val n = 10000
    val d = spark.range(n).select(Sampling.split(col("id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d.values.sum === n)
    assert(math.abs(d("train") - 8000) < 300, d.toString)
    assert(math.abs(d("val") - 1000) < 150, d.toString)
    assert(math.abs(d("test") - 1000) < 150, d.toString)
    // determinism under repartition: same assignment per key
    val a = spark.range(n).repartition(13).select(col("id"), Sampling.split(col("id")).as("s"))
    val b = spark.range(n).repartition(3).select(col("id"), Sampling.split(col("id")).as("s2"))
    assert(a.join(b, "id").filter(col("s") =!= col("s2")).count() === 0)
  }

  test("stratifiedKeep downsamples only listed strata") {
    val d = spark.range(4000)
      .withColumn("lang", when(col("id") % 2 === 0, "en").otherwise("fr"))
      .withColumn("keep", Sampling.stratifiedKeep(col("id"), col("lang"), Map("en" -> 250)))
    val kept = d.groupBy("lang")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("k"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kept("fr")._1 === kept("fr")._2) // unlisted stratum kept whole
    val enFrac = kept("en")._1.toDouble / kept("en")._2
    assert(enFrac > 0.18 && enFrac < 0.32, enFrac.toString)
  }

  test("packConcat: per-shard prefix layout, offsets within ctx") {
    val d = Seq(
      ("s1", 1L, 300L), ("s1", 2L, 300L), ("s1", 3L, 100L),
      ("s2", 1L, 600L), ("s2", 2L, 10L))
      .toDF("src", "ord", "sz")
    val out = Packing.packConcat(d, "src", "ord", "sz", ctxTokens = 512)
      .select("src", "ord", "bin", "offset")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // s1: starts 0, 300, 600 -> bins 0,0,1; offsets 0,300,88
    assert(out(("s1", 1L)) === ((0L, 0L)))
    assert(out(("s1", 2L)) === ((0L, 300L)))
    assert(out(("s1", 3L)) === ((1L, 88L)))
    // s2 packs independently: starts 0, 600
    assert(out(("s2", 1L)) === ((0L, 0L)))
    assert(out(("s2", 2L)) === ((1L, 88L)))
  }

  test("packConcat invariants on random sizes (sampled property)") {
    import org.scalacheck.Gen
    val sizes = Gen.listOfN(200, Gen.chooseNum(1L, 700L)).sample.get
    val ctx = 512
    val rows = sizes.zipWithIndex.map { case (sz, i) => (s"s${i % 3}", i.toLong, sz) }
    val out = Packing.packConcat(rows.toDF("src", "ord", "sz"), "src", "ord", "sz", ctx)
      .select("src", "ord", "sz", "bin", "offset")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    out.foreach { case (_, shard) =>
      val sorted = shard.sortBy(_._2)
      var running = 0L
      sorted.foreach { case (_, _, sz, bin, offset) =>
        assert(offset >= 0 && offset < ctx)
        assert(bin === running / ctx) // start position chunked by ctx
        assert(offset === running % ctx)
        running += sz
      }
      // bins are non-decreasing in packing order
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.toSeq)
    }
  }

  test("samplePermille sample sets are nested as the rate grows") {
    val d = spark.range(5000)
      .withColumn("k200", Sampling.samplePermille(col("id"), 200))
      .withColumn("k600", Sampling.samplePermille(col("id"), 600))
    // every member of the 20% sample is in the 60% sample (same salt)
    assert(d.filter(col("k200") && !col("k600")).count() === 0)
    val n600 = d.filter(col("k600")).count()
    assert(math.abs(n600 - 3000L) < 200, n600.toString)
  }

  test("quantizeInt8: range, max maps to +-127, zero vector guarded") {
    val out = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("id", "v")
      .select(col("id"), Similarity.quantizeInt8(col("v")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) === Seq(64L, -127L, 32L)) // round(0.5*127), -127, round(31.75)
    assert(out(2L) === Seq(0L, 0L, 0L))
  }

  test("kmeansLloyd matches a local reference implementation") {
    // two tight clusters around (0,0) and (10,10); seeds are ids 0,1
    val vecs: Seq[(Long, Seq[Float])] = Seq(
      0L -> Seq(0.1f, 0.0f), 1L -> Seq(9.9f, 10.0f),
      2L -> Seq(0.2f, 0.1f), 3L -> Seq(10.1f, 9.8f),
      4L -> Seq(0.0f, 0.3f), 5L -> Seq(9.7f, 10.2f))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.kmeansLloyd(df, "vec_id", "embedding", k = 2, iters = 2, dim = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // local replica: milli-quantize, 2 Lloyd rounds, floor-div update
    var cents = Map(0L -> Array(100L, 0L), 1L -> Array(9900L, 10000L))
    val q = vecs.map { case (id, v) => id -> v.map(x => math.round(x.toDouble * 1000.0)).toArray }
    def assign(c: Map[Long, Array[Long]]) = q.map { case (id, v) =>
      id -> c.minBy { case (cid, cv) =>
        (v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }._1
    }.toMap
    for (_ <- 1 to 2) {
      val asg = assign(cents)
      cents = cents.map { case (cid, cv) =>
        val members = q.filter { case (id, _) => asg(id) == cid }.map(_._2)
        if (members.isEmpty) cid -> cv
        else cid -> Array.tabulate(2)(d =>
          Math.floorDiv(members.map(_(d)).sum, members.size.toLong))
      }
    }
    assert(got === assign(cents))
    assert(got.values.toSet.size === 2)
  }

  test("kmeansTrainFarthest: deterministic, escapes the lowest-id seed trap") {
    // ids 0..2 all sit in one tight cluster, 3..5 in another: lowest-id
    // seeding at k=2 puts BOTH seeds in cluster A; farthest-point seeding
    // must pick its second seed from cluster B
    val vecs: Seq[(Long, Seq[Float])] = Seq(
      0L -> Seq(0.1f, 0.0f), 1L -> Seq(0.2f, 0.1f), 2L -> Seq(0.0f, 0.3f),
      3L -> Seq(9.9f, 10.0f), 4L -> Seq(10.1f, 9.8f), 5L -> Seq(9.7f, 10.2f))
    val df = vecs.toDF("vec_id", "embedding")
    val c1 = Similarity.kmeansTrainFarthest(df, "vec_id", "embedding",
      k = 2, iters = 2, dim = 2)
    val c2 = Similarity.kmeansTrainFarthest(df, "vec_id", "embedding",
      k = 2, iters = 2, dim = 2)
    assert(c1.map(_._1).toSeq === c2.map(_._1).toSeq)
    assert(c1.map(_._2.toSeq) === c2.map(_._2.toSeq))
    // seed ids: lowest id first, then the farthest vector (cluster B)
    assert(c1.map(_._1).toSet === Set(0L, 5L) || c1.map(_._1).toSet === Set(0L, 3L) ||
      c1.map(_._1).toSet === Set(0L, 4L), c1.map(_._1).mkString(","))
    // trained centroids separate the clusters: assignment recovers A|B
    val asg = Similarity.assignWithCentroids(df, "vec_id", "embedding", c1.toSeq)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(asg(0L), asg(1L), asg(2L)).size === 1)
    assert(Set(asg(3L), asg(4L), asg(5L)).size === 1)
    assert(asg(0L) !== asg(3L))
  }

  test("mixReweight rebalances to the target mix at maximum volume") {
    import graft.ops.Sampling
    // 1000 docs of group 0, 100 of group 1; target 50/50. The mix admits
    // T = 200 docs: group 1 keeps EVERYTHING (rate 1000), group 0 keeps
    // ~10% (rate 100).
    val df = ((0 until 1000).map(i => (i.toLong, 0L)) ++
      (1000 until 1100).map(i => (i.toLong, 1L))).toDF("id", "g")
    val kept = Sampling.mixReweight(df, col("g"), col("id"),
      Map(0L -> 500L, 1L -> 500L), salt = "t")
    val byG = kept.groupBy("g").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byG(1L) === 100L) // rate 1000 keeps the scarce group whole
    // hash-threshold keeps ~rate/1000 of the big group (exact count is
    // deterministic but hash-dependent; bound it near 10%)
    assert(byG(0L) >= 70L && byG(0L) <= 130L, s"group0 kept ${byG(0L)}")
    // deterministic: a second run selects the identical survivor set
    val again = Sampling.mixReweight(df, col("g"), col("id"),
      Map(0L -> 500L, 1L -> 500L), salt = "t")
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
    // invalid targets are rejected loudly
    intercept[IllegalArgumentException] {
      Sampling.mixReweight(df, col("g"), col("id"), Map(0L -> 500L, 1L -> 400L))
    }
  }

  test("temperatureRates flatten the mix: rare groups up-weighted, cap at 1e6") {
    import graft.ops.Sampling
    // 1600 docs of 'big', 100 of 'rare': natural shares 94%/6%; √-flattened
    // target shares 80%/20% of half the corpus. rare's rate must exceed
    // big's, and rare lands at (or near) the 1e6 cap while big stays low.
    val df = ((0 until 1600).map(i => (i.toLong, "big")) ++
      (1600 until 1700).map(i => (i.toLong, "rare"))).toDF("id", "lang")
    val rates = Sampling.temperatureRates(df, col("lang"))
    assert(rates("rare") > rates("big"))
    assert(rates("rare") <= 1000000L && rates("big") < 500000L)
    // exact re-derivation: the published formula, step for step
    val wBig = math.floor(1e6 * math.sqrt(1600.0)).toLong
    val wRare = math.floor(1e6 * math.sqrt(100.0)).toLong
    val t = 1700L / 2
    def rate(w: Long, n: Long) = math.min(1000000L,
      math.floor(1e6 * t.toDouble * w.toDouble / (wBig + wRare).toDouble / n.toDouble).toLong)
    assert(rates === Map("big" -> rate(wBig, 1600), "rare" -> rate(wRare, 100)))
  }

  test("tokenBudgetKeep == global-window prefix selection, budgets exact") {
    // synthetic corpus: 2 groups x 300 docs, token counts 1..60
    val df = spark.range(600).select(
      col("id"), (col("id") % 2).as("g"), (col("id") % 60 + 1).as("t"))
      .persist()
    val budgets = Map(0L -> 500L, 1L -> 1000000L) // capped + uncapped
    val kept = Sampling.tokenBudgetKeep(df, col("g"), col("id"), col("t"),
      budgets, buckets = 8, salt = "x")
    // oracle: the straightforward global cumsum in the same priority order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g")
      .orderBy(Sampling.hashBucket(col("id"), 8, "x"), col("id"))
    val expect = df.withColumn("cum", sum("t").over(w))
      .filter(col("cum") <= when(col("g") === 0, 500L).otherwise(1000000L))
    val a = kept.select("id").as[Long].collect().sorted.toSeq
    val b = expect.select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // capped group sits within 60 (max doc) of its budget, never over
    val used = kept.filter(col("g") === 0).agg(sum("t")).head().getLong(0)
    assert(used <= 500L && used > 500L - 60L, s"used=$used")
    // uncapped group kept whole
    assert(kept.filter(col("g") === 1).count() === 300L)
    df.unpersist()
  }

  test("q_curation_funnel is a true funnel: stages chain and attrition sums") {
    val rows = graft.SparkEntry.queries("q_curation_funnel")(
        spark, "/root/testdata/sf0.001")
      .orderBy("stage").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("entered") ===
        r.getAs[Long]("survived") + r.getAs[Long]("rejected"))
    }
    // each stage's entered == previous stage's survived
    rows.sliding(2).foreach { case Array(prev, next) =>
      assert(next.getAs[Long]("entered") === prev.getAs[Long]("survived"))
    }
    // funnel end == gopher's total pass count (same gates, same corpus)
    val gopherPass = graft.SparkEntry.queries("q_curation_gopher")(
        spark, "/root/testdata/sf0.001")
      .agg(sum("n_pass")).head().getLong(0)
    assert(rows.last.getAs[Long]("survived") === gopherPass)
  }

  test("semantic dedup == all-pairs cosine restricted to shared cells") {
    import graft.ops.Similarity
    import graft.sources.Tables
    val dir = "/root/testdata/sf0.001"
    val em = Tables.embeddings(spark, dir)
    val cents = Similarity.kmeansTrain(em, "vec_id", "embedding", k = 8, iters = 2)
    val assigned = Similarity.assignWithCentroids(em, "vec_id", "embedding", cents.toSeq)
    val cellOf = assigned.select("id", "cell").as[(Long, Long)].collect().toMap
    // unbucketed reference: same quantization, same tau, ALL pairs
    val q = em.select(col("vec_id").cast("long").as("id"),
      Similarity.quantize(col("embedding")).as("q"))
      .as[(Long, Seq[Long])].collect()
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val all = for {
      (i, qa) <- q; (j, qb) <- q
      if i < j && dot(qa, qa) > 0 && dot(qb, qb) > 0
      c = dot(qa, qb).toDouble /
        (math.sqrt(dot(qa, qa).toDouble) * math.sqrt(dot(qb, qb).toDouble))
      if c >= 0.44
    } yield (i, j)
    val expected = all.filter { case (i, j) => cellOf(i) == cellOf(j) }.toSet
    val got = graft.SparkEntry.queries("q_dedup_semantic")(spark, dir)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(got === expected)
    // the bucketing is a real restriction AND a real recall story on this
    // fixture: some pairs exist, and the within-cell subset is non-empty
    assert(all.nonEmpty)
    assert(got.nonEmpty, "fixture should place some near-dup pairs in one cell")
  }

  test("fixed-N sampling: exact counts, capped groups cut, small groups whole") {
    val rows = graft.SparkEntry.queries("q_sample_fixed_n")(
        spark, "/root/testdata/sf0.01")
      .select("grp", "n_kept").as[(Long, Long)].collect().toMap
    // capped groups keep EXACTLY their target
    assert(rows(1L) === 40L && rows(2L) === 25L && rows(3L) === 10L, rows.toString)
    // the uncapped group keeps everything it has
    val g0 = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .filter(expr("CAST(substring(source, 4) AS BIGINT) % 4 = 0")).count()
    assert(rows(0L) === g0)
  }

  test("multi-probe semantic dedup: == ground truth restricted to intersecting probe sets") {
    import graft.ops.Similarity
    import graft.sources.Tables
    val dir = "/root/testdata/sf0.001"
    val em = Tables.embeddings(spark, dir)
    val cents = Similarity.kmeansTrain(em, "vec_id", "embedding", k = 8, iters = 2)
    val cellsOf = Similarity
      .assignWithCentroidsTopP(em, "vec_id", "embedding", cents.toSeq, p = 2)
      .select("id", "cell").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).toSet }
    val q = em.select(col("vec_id").cast("long").as("id"),
      Similarity.quantize(col("embedding")).as("q"))
      .as[(Long, Seq[Long])].collect()
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val all = (for {
      (i, qa) <- q; (j, qb) <- q
      if i < j && dot(qa, qa) > 0 && dot(qb, qb) > 0
      c = dot(qa, qb).toDouble /
        (math.sqrt(dot(qa, qa).toDouble) * math.sqrt(dot(qb, qb).toDouble))
      if c >= 0.44
    } yield (i, j)).toSet
    val expected = all.filter { case (i, j) => cellsOf(i).exists(cellsOf(j)) }
    val got2 = graft.SparkEntry.queries("q_dedup_semantic_probe2")(spark, dir)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val got1 = graft.SparkEntry.queries("q_dedup_semantic")(spark, dir)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(got2 === expected)
    assert(got1.subsetOf(got2), "top-1 pairs must survive multi-probe")
    assert(got2.subsetOf(all), "bucketing must never fabricate a pair")
  }

  test("leakage-safe split never splits a near-dup cluster") {
    import graft.ops.Dedup
    import graft.sources.Tables
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, numHashes = 16, bands = 4, tau = 0.5)
    val lab = Dedup.dedupClusters(pairs).withColumnRenamed("id", "doc_id")
    val assigned = docs.join(lab, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster"), col("doc_id")))
      .withColumn("split", Sampling.split(col("rep"), salt = "leak"))
    // the guard: every cluster maps to exactly one split
    val straddling = assigned.filter(col("cluster").isNotNull)
      .groupBy("cluster").agg(countDistinct("split").as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddling === 0L)
    // and the fixture actually exercises it: clusters exist
    assert(lab.count() > 0L)
  }

  test("epochReplicate: exact copy counts, contiguous epoch index, drop at 0") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, i % 4)).toDF("k", "g")
    val targets = Map(0L -> 2500L, 1L -> 1000L, 2L -> 400L, 3L -> 0L)
    val out = Sampling.epochReplicate(df, col("g"), col("k"), targets, "t")
    val rows = out.select("k", "g", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // per-key copy count == whole + (0|1); epoch indices are 1..n
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val g = vs.head._2
      val whole = targets(g) / 1000L
      val n = vs.length.toLong
      assert(n == whole || n == whole + 1, s"key $k: $n copies")
      assert(vs.map(_._3).sorted.toSeq == (1L to n), s"key $k: epoch gap")
    }
    // factor-0 group fully dropped; identity group exactly once
    assert(!rows.exists(_._2 == 3L))
    assert(rows.count(_._2 == 1L) === 100)
    // fractional volume lands near expectation (hash-uniform: ±40%)
    val n0 = rows.count(_._2 == 0L)
    assert(n0 >= 200 && n0 <= 300, s"group 0 rows: $n0")   // E=250
    val n2 = rows.count(_._2 == 2L)
    assert(n2 >= 20 && n2 <= 60, s"group 2 rows: $n2")     // E=40
  }
}
