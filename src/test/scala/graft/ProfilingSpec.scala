package graft

import org.apache.spark.sql.functions._
import graft.ops.Profiling

/** Profiling / constraint / drift family (`ops/Profiling`). */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profileNumeric: nulls, exact distinct, fixed-point mean") {
    val df = Seq(
      (1L, Some(10.25)), (2L, Some(10.25)), (3L, Some(20.50)), (4L, None))
      .toDF("k", "v")
    val got = Profiling.profileNumeric(df, Seq("k" -> 1L, "v" -> 100L))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(got("k") === ((4L, 0L, 4L, 1.0, 4.0, 2.5)))
    // v: 3 non-null, 1 null, 2 distinct; mean = (1025+1025+2050)/100/3
    assert(got("v") === ((3L, 1L, 2L, 10.25, 20.5, 13.6667)))
  }

  test("profileCategorical: string min/max, nulls excluded from count") {
    val df = Seq(Some("beta"), Some("alpha"), None).toDF("s")
    val r = Profiling.profileCategorical(df, Seq("s")).collect()(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getString(4), r.getString(5)) === (("s", 2L, 1L, 2L, "alpha", "beta")))
  }

  test("predicateChecks: pass/fail thresholds; null predicate counts as bad") {
    val df = Seq(Some(5), Some(50), None).toDF("x")
    val got = Profiling.predicateChecks(df, Seq(
      Profiling.Check("all_le_50", col("x") <= 50, 1000000L),
      Profiling.Check("two_thirds_le_10", col("x") <= 10, 600000L)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // null x -> predicate null -> not good: 2/3 for both checks
    assert(got("all_le_50") === ((666666L, false)))
    assert(got("two_thirds_le_10") === ((333333L, false)))
  }

  test("uniquenessCheck and riCheck ratios") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(1L, 1L, 2L, 99L).toDF("fk")
    val uq = Profiling.uniquenessCheck(child, "fk", "u", 1000000L).collect()(0)
    assert((uq.getLong(1), uq.getBoolean(2)) === ((750000L, false)))
    val ri = Profiling.riCheck(child, "fk", parent, "pk", "ri", 1000000L)
      .collect()(0)
    assert((ri.getLong(1), ri.getBoolean(2)) === ((750000L, false)))
  }

  test("embCovariance: exact integer sums match hand math across partitions") {
    // vectors (in milli-units after quantize): (1000,2000), (3000,4000),
    // (5000,0) — n=3, S0=9000, S1=6000, S00=35e6, S01=14e6, S11=20e6
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), Seq(5.0f, 0.0f))
      .toDF("embedding").repartition(3) // force partial-matrix merging
    val got = Profiling.embCovariance(df, "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got((0L, 0L))._1 === 35000000L)
    assert(got((0L, 1L))._1 === 14000000L)
    assert(got((1L, 1L))._1 === 20000000L)
    // cov00 = (3*35e6 - 9000^2)/9/1e6 = 24e6/9e6 -> round 2.666667
    assert(got((0L, 0L))._2 === 2.666667)
    // cov01 = (3*14e6 - 9000*6000)/9/1e6 = -12e6/9e6 -> round -1.333333
    assert(got((0L, 1L))._2 === -1.333333)
    assert(got.size === 3)
  }

  test("labelSeparability: exact centroids, intra/inter/ratio hand math") {
    // label 0 around (+1, 0), label 1 around (−1, 0) in milli-units:
    // centroids (1100, 0) / (−1100, 0); S = 100²·2 = 20000 each;
    // inter = 2200² = 4.84e6; sep = 4.84e6·2/2e4 = 484
    val df = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(1.2f, 0.0f), 0),
      (2L, Seq(-1.0f, 0.0f), 1), (3L, Seq(-1.2f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Profiling.labelSeparability(df, "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(0L) === ((2L, 0.01, 4.84, 484.0)))
    assert(got(1L) === ((2L, 0.01, 4.84, 484.0)))
  }

  test("quantileNormBinned: left-continuous ECDF, monotone in value, per group") {
    // group A: values 0,10,...,990 (uniform); group B: constant (w=0 path)
    val df = ((0 until 100).map(i => (i.toLong, "A", i * 10.0)) ++
      (100 until 110).map(i => (i.toLong, "B", 7.0))).toDF("k", "g", "v")
    val got = Profiling.quantileNormBinned(df, col("g"), col("v"),
      keys = Seq("k"), nBins = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // A: value i*10 lands in bin i/10; 10 values per lower bin ->
    // norm_ppm = bin * 100000 exactly
    assert(got(0L) === ((0L, 0L)))
    assert(got(55L) === ((5L, 500000L)))
    assert(got(99L) === ((9L, 900000L)))
    // monotone in v within the group
    val aNorms = (0 until 100).map(i => got(i.toLong)._2)
    assert(aNorms.zip(aNorms.tail).forall { case (x, y) => x <= y })
    // constant group: zero width -> everyone bin 0, norm 0
    assert((100 until 110).forall(i => got(i.toLong) === ((0L, 0L))))
  }

  test("snapshotDiff: added/removed/changed/same with null-safe compare") {
    val a = Seq((1L, Some("x"), 10.0), (2L, None: Option[String], 20.0),
      (3L, Some("z"), 30.0), (4L, Some("w"), 40.0)).toDF("k", "s", "v")
    val b = Seq((1L, Some("x"), 10.0),     // same
      (2L, None: Option[String], 20.0),    // same (null <=> null)
      (3L, Some("z"), 31.0),               // changed (v)
      (5L, Some("new"), 50.0))             // added; k=4 removed
      .toDF("k", "s", "v")
    val got = Profiling.snapshotDiff(a, b, "k", Seq("s", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("same" -> 2L, "changed" -> 1L,
      "added" -> 1L, "removed" -> 1L))
  }

  test("psiDrift is symmetric; snapshotDiff counts conserve (generated data)") {
    import org.scalacheck.Gen
    val rnd = new scala.util.Random(42)
    // psi symmetry: (p−q)·ln(p/q) is invariant under p↔q
    val vals = Gen.listOfN(300, Gen.chooseNum(0.0, 100.0)).sample.get
    val flags = List.fill(300)(rnd.nextBoolean())
    val df = vals.zip(flags).toDF("v", "a")
    val psiAB = Profiling.psiDrift(df, col("v"), col("a"), 8).collect()(0).getDouble(1)
    val psiBA = Profiling.psiDrift(df, col("v"), !col("a"), 8).collect()(0).getDouble(1)
    assert(psiAB === psiBA)

    // diff conservation: same+changed+removed = |A|, same+changed+added = |B|
    val keysA = Gen.listOfN(200, Gen.chooseNum(0L, 120L)).sample.get.distinct
    val keysB = Gen.listOfN(200, Gen.chooseNum(60L, 180L)).sample.get.distinct
    val a = keysA.map(k => (k, k % 7)).toDF("k", "v")
    val b = keysB.map(k => (k, k % 5)).toDF("k", "v")
    val st = Profiling.snapshotDiff(a, b, "k", Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .withDefaultValue(0L)
    assert(st("same") + st("changed") + st("removed") === keysA.size.toLong)
    assert(st("same") + st("changed") + st("added") === keysB.size.toLong)
  }

  test("psiDrift: identical slices score 0, a shifted slice scores > 0") {
    // same values on both sides -> per-bin p == q -> psi exactly 0
    val same = (1 to 100).flatMap(i => Seq((i.toDouble, true), (i.toDouble, false)))
      .toDF("v", "a")
    val r0 = Profiling.psiDrift(same, col("v"), col("a"), 10).collect()(0)
    assert(r0.getLong(0) === 10L && r0.getDouble(1) === 0.0)

    // slice A low-heavy, slice B high-heavy -> clear positive drift
    val shifted = ((1 to 80).map(i => (i % 40 + 1.0, true)) ++
      (1 to 80).map(i => (i % 40 + 60.0, false))).toDF("v", "a")
    val r1 = Profiling.psiDrift(shifted, col("v"), col("a"), 10).collect()(0)
    assert(r1.getDouble(1) > 0.25)

    // constant column: zero bin width must not divide by zero
    val const = Seq((5.0, true), (5.0, false)).toDF("v", "a")
    val r2 = Profiling.psiDrift(const, col("v"), col("a"), 10).collect()(0)
    assert(r2.getLong(0) === 1L && r2.getDouble(1) === 0.0)
  }

  test("exactMedianBinned == sorted reference: odd/even, dups, all-equal, skew") {
    def check(vals: Seq[Double]): Unit = {
      val got = Profiling.exactMedianBinned(vals.toDF("v"), col("v"), nBins = 16)
        .head()
      val expect = vals.sorted.apply(((vals.size + 1) / 2 - 1))
      assert(got.getLong(0) === vals.size.toLong)
      assert(got.getDouble(1) === expect, s"vals=$vals")
    }
    val rnd = new scala.util.Random(11)
    check((1 to 101).map(_ => rnd.nextDouble() * 1000))          // odd n
    check((1 to 100).map(_ => rnd.nextDouble() * 1000))          // even n
    check(Seq(5.0, 5.0, 5.0, 1.0, 9.0, 5.0, 5.0))                // heavy dups
    check(Seq.fill(20)(7.5))                                     // all equal
    check((1 to 99).map(i => if (i < 95) 1.0 else 1e9))          // extreme skew
  }

  test("pcaTopComponent: finds the dominant axis, bit-identical across partitionings") {
    val rnd = new scala.util.Random(5)
    // anisotropic cloud: dim 2 variance 10x the rest
    val data = (1 to 300).map { _ =>
      Tuple1(Array.tabulate(8)(d =>
        (rnd.nextGaussian() * (if (d == 2) 5.0 else 0.5)).toFloat)) }
    val runs = Seq(1, 5).map { parts =>
      val got = Profiling.pcaTopComponent(
        data.toDF("embedding").repartition(parts), "embedding")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.ops.CacheRegistry.drain()
      got
    }
    assert(runs(0) === runs(1), "loadings must not depend on partitioning")
    val v = runs.head
    val dominant = v.maxBy { case (_, l) => math.abs(l) }._1
    assert(dominant === 2L)
    v.filter(_._1 != 2L).foreach { case (i, l) =>
      assert(math.abs(l) * 3 <= math.abs(v(2L)), s"dim $i should be minor") }
  }

  test("exactMedianBinned plan: every window is partitioned (no global-sort task)") {
    val vals = (1 to 500).map(i => ((i * 37) % 101).toDouble)
    // collect on the logical plan — the physical tree hides under
    // AdaptiveSparkPlanExec and its collect sees only the wrapper
    val plan = Profiling.exactMedianBinned(vals.toDF("v"), col("v"), nBins = 16)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty, "expected the cumulative pick window in the plan")
    windows.foreach(w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned Window (single-task straggler): $w"))
  }

  test("exactQuantilesBinnedGrouped: 1k groups stay correct via broadcast-join binning") {
    // A when-chain over 1k groups would blow the codegen method budget;
    // the broadcast-join form's expression depth is constant in #groups.
    // Pin correctness at 1k groups plus the join in the plan.
    val rnd = new scala.util.Random(7)
    val data = (0 until 1000).flatMap { g =>
      (0 until 8).map(_ => (s"g$g", rnd.nextInt(1000).toDouble)) }
    val out = Profiling.exactQuantilesBinnedGrouped(
      data.toDF("g", "v"), col("g"), col("v"), Seq(50), nBins = 8)
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val got = out.collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got.size === 1000)
    val byG = data.groupBy(_._1)
    Seq("g0", "g499", "g999").foreach { g =>
      val sorted = byG(g).map(_._2).sorted
      val k = math.floor(0.5 * (sorted.size - 1)).toInt
      assert(got(g) === sorted(k), s"group $g")
    }
  }

  test("exactQuantilesBinnedGrouped: one eager metadata action on the common path") {
    // the round-10 contract: group stats + cell counts fold into ONE
    // collect over the data-independent monotone log-grid; only the
    // final pick adds a second action. Count ACTIONS (QueryExecutions),
    // not jobs — AQE splits one action into several jobs.
    val data = (0 until 4).flatMap { g =>
      (1 to 200).map(i => (s"g$g", ((i * 37) % 101).toDouble)) }
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = actions.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      Profiling.exactQuantilesBinnedGrouped(
        data.toDF("g", "v"), col("g"), col("v"), Seq(25, 50, 75), nBins = 16)
        .collect()
      // listener delivery is async (round-6 gotcha): drain the listener
      // bus deterministically instead of wall-clock polling — after
      // waitUntilEmpty every event posted by the collect above has been
      // delivered, so the count can neither under- nor over-shoot later
      org.apache.spark.GraftListenerBridge.waitUntilEmpty(spark.sparkContext)
      assert(actions.get() === 2,
        s"expected exactly 2 eager actions (metadata + pick), got ${actions.get()}")
    } finally spark.listenerManager.unregister(l)
  }

  test("exactQuantilesBinnedGrouped: oversized-cell recursion stays exact") {
    // force the adaptive sub-binning path: cap far below the group size,
    // heavy duplication AND a wide-spread cell so relocation matters
    val rnd = new scala.util.Random(31)
    val data = (1 to 3000).map(_ => ("a", rnd.nextInt(500).toDouble)) ++
      (1 to 2000).map(_ => ("a", 1000000.0 + rnd.nextInt(1000))) ++
      (1 to 50).map(_ => ("b", rnd.nextDouble() * 10))
    val got = Profiling.exactQuantilesBinnedGrouped(
        data.toDF("g", "v"), col("g"), col("v"), Seq(10, 50, 90),
        nBins = 8, pickWindowCap = 100L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val byG = data.groupBy(_._1)
    for ((g, vs) <- byG; q <- Seq(10, 50, 90)) {
      val sorted = vs.map(_._2).sorted
      val k = math.floor(q / 100.0 * (sorted.size - 1)).toInt
      assert(got((g, q.toLong)) === ((sorted.size.toLong, sorted(k))),
        s"group $g q$q")
    }
  }

  test("exactQuantilesBinnedGrouped: wide-branch seam and saturation ordering") {
    // values straddling the piecewise fold's 2^41 seam exactly, the wide
    // branch proper, and the 2^81 saturation cells — ordering must hold
    // across every boundary (the monotone-key contract at its edges)
    val seam = 2199023255552.0 // 2^41
    val data =
      Seq.tabulate(50)(i => ("s", seam - 1000.0 + i * 40.0)) ++ // across the seam
      Seq.tabulate(50)(i => ("s", -seam - 1000.0 + i * 40.0)) ++ // mirrored seam
      Seq.tabulate(30)(i => ("s", i * 1e20)) ++                 // wide branch
      Seq.tabulate(20)(i => ("s", 2.5e24 + i * 1e22))           // saturated cells
    val got = Profiling.exactQuantilesBinnedGrouped(
        data.toDF("g", "v"), col("g"), col("v"), Seq(10, 50, 90), nBins = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val sorted = data.map(_._2).sorted
    for (q <- Seq(10, 50, 90)) {
      val k = math.floor(q / 100.0 * (sorted.size - 1)).toInt
      assert(got(("s", q.toLong)) === sorted(k), s"q$q")
    }
  }

  test("exactQuantilesBinnedGrouped: negative, fractional, and clamp-range values") {
    // the monotone key must order correctly across the sign mirror, the
    // 2^-20 fixed-point fold, and the +/-2^42 clamp cells
    val data = Seq.tabulate(400)(i => ("m", (i - 200) * 7.25)) ++
      Seq.tabulate(100)(i => ("m", i * 1e13)) // beyond the clamp: one cell
    val got = Profiling.exactQuantilesBinnedGrouped(
        data.toDF("g", "v"), col("g"), col("v"), Seq(10, 50, 90), nBins = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val sorted = data.map(_._2).sorted
    for (q <- Seq(10, 50, 90)) {
      val k = math.floor(q / 100.0 * (sorted.size - 1)).toInt
      assert(got(("m", q.toLong)) === sorted(k), s"q$q")
    }
  }

  test("exactQuantilesBinnedGrouped == per-group sorted reference") {
    val rnd = new scala.util.Random(23)
    val data = Seq("a", "b", "c").flatMap { g =>
      val n = 50 + rnd.nextInt(60)
      (1 to n).map(_ => (g, math.floor(rnd.nextDouble() * 500) / 10.0))
    } ++ Seq.fill(10)(("d", 42.0))   // zero-width group
    val got = Profiling.exactQuantilesBinnedGrouped(
        data.toDF("g", "v"), col("g"), col("v"), Seq(10, 50, 90), nBins = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val byG = data.groupBy(_._1)
    for ((g, vs) <- byG; q <- Seq(10, 50, 90)) {
      val sorted = vs.map(_._2).sorted
      val k = math.floor(q / 100.0 * (sorted.size - 1)).toInt
      assert(got((g, q.toLong)) === ((sorted.size.toLong, sorted(k))),
        s"group $g q$q")
    }
  }

  test("ksDrift: 0 on identical slices, ~1 on disjoint, symmetric, in [0,1]") {
    // identical slices -> every cumulative difference is exactly 0
    val same = (1 to 100).flatMap(i => Seq((i.toDouble, true), (i.toDouble, false)))
      .toDF("v", "a")
    val r0 = Profiling.ksDrift(same, col("v"), col("a"), 10).collect()(0)
    assert(r0.getLong(0) === 10L && r0.getDouble(1) === 0.0)

    // disjoint supports -> some boundary separates them completely
    val disjoint = ((1 to 50).map(i => (i.toDouble, true)) ++
      (1 to 50).map(i => (i + 1000.0, false))).toDF("v", "a")
    val r1 = Profiling.ksDrift(disjoint, col("v"), col("a"), 10).collect()(0)
    assert(r1.getDouble(1) === 1.0)

    // symmetric under A<->B (|Fa-Fb| is), and always within [0,1]
    val rnd = new scala.util.Random(7)
    val mixed = (1 to 300).map(_ => (rnd.nextDouble() * 100, rnd.nextBoolean()))
      .toDF("v", "a")
    val kAB = Profiling.ksDrift(mixed, col("v"), col("a"), 12).collect()(0).getDouble(1)
    val kBA = Profiling.ksDrift(mixed, col("v"), !col("a"), 12).collect()(0).getDouble(1)
    assert(kAB === kBA && kAB >= 0.0 && kAB <= 1.0)

    // constant column: zero bin width must not divide by zero
    val const = Seq((5.0, true), (5.0, false)).toDF("v", "a")
    val r2 = Profiling.ksDrift(const, col("v"), col("a"), 10).collect()(0)
    assert(r2.getLong(0) === 1L && r2.getDouble(1) === 0.0)
  }
}
