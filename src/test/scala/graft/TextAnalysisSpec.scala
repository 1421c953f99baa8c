package graft

import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, TextAnalysis => TA}
import graft.functions.Hashing

/** Text analysis + multimodal stub + cross-engine hashing pins. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token stats: counts, distinct, stopwords, ratios") {
    val got = Seq("the quick fox the a fox").toDF("text")
      .select(
        TA.nTokens(TA.tokens(col("text"))).as("n"),
        TA.nDistinctTokens(TA.tokens(col("text"))).as("d"),
        TA.nStopwords(TA.tokens(col("text"))).as("s"),
        TA.stopRatio(TA.tokens(col("text"))).as("sr"))
      .collect()(0)
    assert(got.getInt(0) === 6)
    assert(got.getInt(1) === 4)
    assert(got.getInt(2) === 3) // the, the, a
    assert(got.getDouble(3) === 0.5)
  }

  test("qualityScore is in [0,1] and rewards long diverse low-stopword text") {
    val rows = Seq(
      "the the the the a a",                      // all stopwords
      "alpha beta gamma delta epsilon zeta").toDF("text")
      .select(TA.qualityScore(TA.tokens(col("text"))).as("q"))
      .collect().map(_.getDouble(0))
    assert(rows.forall(q => q >= 0.0 && q <= 1.0))
    assert(rows(1) > rows(0))
  }

  test("setFingerprint is order-insensitive, content-sensitive") {
    val fps = Seq("b a c", "c b a", "a b d").toDF("text")
      .select(TA.setFingerprint(TA.tokens(col("text"))).as("f"))
      .collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("md5Long pins the cross-engine value (DuckDB-checked constant)") {
    // ('0x' || substring(md5('abc'),1,15))::BIGINT == 648541476951500027
    val got = Seq("abc").toDF("s")
      .select(Hashing.md5Long(col("s"))).collect()(0).getLong(0)
    assert(got === 648541476951500027L)
  }

  test("minhash permutations stay in [0, p) and differ per seed") {
    val got = Seq("shingle one").toDF("s")
      .select((0 until 4).map(i => Hashing.minhashPerm(col("s"), i).as(s"h$i")): _*)
      .collect()(0)
    val hs = (0 until 4).map(got.getLong)
    assert(hs.forall(h => h >= 0 && h < Hashing.MinhashP))
    assert(hs.distinct.length === 4)
  }

  test("multimodal resize + frame-sample stubs: sizes and stride") {
    val media = Multimodal.asMediaTable(
      Seq((0L, "x" * 300), (1L, "y" * 100)).toDF("doc_id", "text"))
    val resized = Multimodal.resizeStub(spark, media, 16, 16).collect()
      .map(r => r.doc_id -> r).toMap
    assert(resized(0L).media.length === 256) // truncated to w*h
    assert(resized(1L).media.length === 100) // shorter stays whole
    assert(resized(0L).out_w === 16 && resized(0L).out_h === 16)

    val frames = Multimodal.frameSampleStub(spark,
      Multimodal.resizeStub(spark, media, 16, 16).toDF()
        .select(col("doc_id"), col("kind"), col("media")), 64, 2)
      .collect().groupBy(_.doc_id)
    // 256 bytes -> chunks 0..3 of 64; stride 2 keeps idx 0,2
    assert(frames(0L).map(_.frame_idx).sorted.toSeq === Seq(0, 2))
    assert(frames(0L).map(_.frame.length).sum === 128)
    // 100 bytes -> chunks 0 (64), 1 (36); keeps idx 0 only
    assert(frames(1L).map(_.frame_idx).toSeq === Seq(0))
    assert(frames(1L).head.frame.length === 64)
  }

  test("multimodal decode stub: schema, bytes, head byte") {
    val media = Multimodal.asMediaTable(
      Seq((0L, "abc"), (1L, "xyzw"), (2L, "")).toDF("doc_id", "text"))
    assert(media.schema("media").dataType.typeName === "binary")
    val out = Multimodal.decodeStub(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(0L).kind === "image" && out(1L).kind === "audio" && out(2L).kind === "video")
    assert(out(0L).n_bytes === 3L && out(0L).head_byte === 'a'.toInt)
    assert(out(2L).n_bytes === 0L && out(2L).head_byte === -1)
  }

  test("multimodal embed stub: byte folds per dim, short tail frames") {
    import org.apache.spark.sql.functions.col
    // frame "abcd" with dim=3: v0 = 'a'+'d' = 197, v1 = 'b' = 98, v2 = 'c' = 99
    val frames = Seq((1L, 0, "abcd".getBytes("UTF-8")), (1L, 2, "xy".getBytes("UTF-8")))
      .toDF("doc_id", "frame_idx", "frame")
    val out = Multimodal.embedStub(spark, frames, dim = 3).collect()
      .map(f => (f.frame_idx, f.dim) -> f.v).toMap
    assert(out((0, 0)) === 197L && out((0, 1)) === 98L && out((0, 2)) === 99L)
    // 2-byte tail frame emits only dims 0 and 1
    assert(out.get((2, 2)).isEmpty)
    assert(out((2, 0)) === 'x'.toLong && out((2, 1)) === 'y'.toLong)
  }

  test("BPE merge table is well-formed (operands are chars or earlier merges)") {
    // the property that makes leftmost-best-rank merging == classic BPE
    val built = scala.collection.mutable.Set.empty[String]
    TA.BpeMerges.foreach { case (l, r) =>
      assert(l.length == 1 || built.contains(l), s"left operand '$l' not derivable")
      assert(r.length == 1 || built.contains(r), s"right operand '$r' not derivable")
      built += (l + r)
    }
  }

  test("bpeSegmentWord follows merge ranks, leftmost on ties") {
    assert(TA.bpeSegmentWord("the").toSeq === Seq("the"))
    assert(TA.bpeSegmentWord("that").toSeq === Seq("that")) // th+at via rank 29
    assert(TA.bpeSegmentWord("thin").toSeq === Seq("th", "in"))
    assert(TA.bpeSegmentWord("and").toSeq === Seq("and"))
    assert(TA.bpeSegmentWord("for").toSeq === Seq("for"))
    assert(TA.bpeSegmentWord("erer").toSeq === Seq("er", "er")) // leftmost first
    assert(TA.bpeSegmentWord("x").toSeq === Seq("x"))
    assert(TA.bpeSegmentWord("zqzq").toSeq === Seq("z", "q", "z", "q")) // no merges
  }

  test("bigramLmScore: corpus-conditional ratios, integer-exact; short docs drop") {
    val docs = Seq((1L, "a b a c"), (2L, "a b"), (3L, "x"), (4L, null))
      .toDF("doc_id", "text")
    val got = TA.bigramLmScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // c2: (a,b)=2 (b,a)=1 (a,c)=1; c1: a=3 b=1
    // r(a,b)=2e6 div 3=666666, r(b,a)=1e6, r(a,c)=333333
    assert(got === Map(
      1L -> ((3L, 666666L + 1000000L + 333333L)),
      2L -> ((1L, 666666L))))
    graft.ops.CacheRegistry.drain()
  }

  test("bpeTrain: weighted pair argmax, pinned tie-break, stops when exhausted") {
    // aaab×2, xy×1. r1: (a,a) 2 occurrences × freq 2 = 4 wins.
    // r2: aaab segments [aa,a,b] -> (aa,a)=2 ties (a,b)=2 -> smaller left
    // operand 'a' wins. r3: [aa,ab] -> (aa,ab)=2. r4: (x,y)=1.
    // r5: nothing left -> training stops early.
    val corpus = Seq("aaab AAAB xy").toDF("text")
    val got = TA.bpeTrain(corpus, "text", nMerges = 8)
    assert(got === Seq(("a", "a", 4L), ("a", "b", 2L),
      ("aa", "ab", 2L), ("x", "y", 1L)))
  }

  test("bpeTrain: local and distributed round engines train identically") {
    // localMaxWords = 0 forces the distributed per-round path; default runs
    // the driver-local rounds. Same merges, same counts, same tie-breaks —
    // including a cross-engine-ordering-sensitive tie (ab vs ba words).
    val corpus = Seq("aaab aaab xy", "ba ab ba ab zq zq",
      "the thin cat that cat", "mississippi").toDF("text")
    val local = TA.bpeTrain(corpus, "text", nMerges = 10)
    val dist = TA.bpeTrain(corpus, "text", nMerges = 10, localMaxWords = 0L)
    assert(local === dist)
    assert(local.nonEmpty)
  }

  test("bpeStats counts words/pieces and checksums segmentations") {
    val got = TA.bpeStats(
      Seq(("en", "The THIN cat, that cat!"), ("en", null)).toDF("lang", "text"),
      "lang", "text").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // words: the, thin, cat, that, cat -> pieces: 1 + 2 + 2 (c|at) + 1 + 2 = 8
    assert(got.toSet.map((t: (String, Long, Long, Long)) => (t._1, t._2, t._3)) ===
      Set(("en", 5L, 8L), ("en", 0L, 0L)))
    // checksum is deterministic: both 'cat' instances contribute equally
    val full = got.find(_._2 == 5L).get
    assert(full._4 > 0L)
  }

  test("bm25TopK: multi-term match outranks single-term, stop guard holds") {
    val docs = (Seq(
      (0L, "common alpha beta"),
      (1L, "common alpha beta"),   // both terms matched -> rank 1
      (2L, "common alpha"),        // one term (shorter doc) -> rank 2
      (3L, "common zeta")          // stop-term-only overlap -> absent
    ) ++ (4L to 7L).map(i => (i, s"common filler$i"))).toDF("id", "text")
    val got = TA.bm25TopK(docs, "id", "text", isQuery = col("id") < 1, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    graft.ops.CacheRegistry.drain()
    assert(got.map(t => (t._1, t._2, t._3)).toSeq === Seq((0L, 1L, 1L), (0L, 2L, 2L)))
    assert(got(0)._4 > got(1)._4 && got(1)._4 > 0.0)
  }

  test("sparseCosineTopK: exact dup at cos 1.0, stop-term guard, no cartesian") {
    // 'common' is in all 8 docs (df=8 > cap=max(5, 0.02*8)=5 -> dropped);
    // doc 3 shares ONLY the stop term with the query -> must not appear.
    val docs = (Seq(
      (0L, "common alpha beta"),   // the query
      (1L, "common alpha beta"),   // exact dup -> rank 1, cos 1.0
      (2L, "common alpha"),        // partial overlap -> rank 2
      (3L, "common zeta")          // stop-term-only overlap -> absent
    ) ++ (4L to 7L).map(i => (i, s"common filler$i"))).toDF("id", "text")
    val got = TA.sparseCosineTopK(docs, "id", "text",
        isQuery = col("id") < 1, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    graft.ops.CacheRegistry.drain()
    assert(got.map(t => (t._1, t._2, t._3)).toSeq === Seq((0L, 1L, 1L), (0L, 2L, 2L)))
    assert(got(0)._4 === 1.0)
    assert(got(1)._4 > 0.5 && got(1)._4 < 1.0)

    // posting-list equi-join, never an all-pairs product
    val plan = TA.sparseCosineTopK(docs, "id", "text",
      isQuery = col("id") < 1, k = 3).queryExecution.executedPlan.toString
    graft.ops.CacheRegistry.drain()
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("materialized IR index: consumer plans are tokenization-free") {
    // the materialize-once contract for the sparse retrieval family:
    // BM25 / sparse-cosine score off the parquet (postings, doclen)
    // artifact — no explode/Generate, no xxhash64 of raw tokens, no
    // documents scan anywhere in the consumer plan
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q_sim_bm25", "q_sim_sparse_cosine")) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_ir_index_"), s"$q: $plan")
      assert(!plan.contains("Generate"), s"$q: $plan")
      assert(!plan.contains("documents"), s"$q: $plan")
      graft.ops.CacheRegistry.drain()
    }
    // index-scored results == build-from-raw results (same fixture)
    val root = graft.queries.PipelineQueries.irIndexArtifact(spark, sf)
    val fromIdx = TA.bm25FromIndex(spark.read.parquet(root + "/postings"),
      spark.read.parquet(root + "/doclen"), k = 5).collect().toSet
    graft.ops.CacheRegistry.drain()
    val docs = graft.sources.Tables.documents(spark, sf)
    import org.apache.spark.sql.functions.{concat, lit}
    val planted = docs.select(col("doc_id"), concat(col("text"),
      lit(" topic"), (col("doc_id") % 40).cast("string"),
      lit(" topic"), (col("doc_id") % 40).cast("string"),
      lit(" ent"), (col("doc_id") % 200).cast("string")).as("text"))
    val fromRaw = TA.bm25TopK(planted, "doc_id", "text",
      isQuery = col("doc_id") < 20, k = 5, stopTermFrac = 0.05).collect().toSet
    graft.ops.CacheRegistry.drain()
    assert(fromIdx === fromRaw)
  }
}
