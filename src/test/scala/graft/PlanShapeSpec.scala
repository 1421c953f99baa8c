package graft

/** Physical-plan regression pins for the round-4 queries: the properties
  * that make them scale are asserted on the executed plan, not just
  * described in scaladoc.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    graft.ops.CacheRegistry.drain()
    p
  }

  test("runtime bloom filter injects into a selective shuffle join") {
    // the GraftSession posture: at 100 TB a fact-fact shuffle join with a
    // selective predicate on one side gets that side's join keys as a
    // bloom filter on the probe side's scan. The 10 GB application-side
    // threshold keeps local plans untouched — lower it (and disable
    // broadcast) to observe the injection itself.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val li = graft.sources.Tables.lineitem(spark, sf)
      val ord = graft.sources.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg"), p)
      assert(p.contains("might_contain"), p)
      // and the filtered plan still returns the right rows
      assert(j.collect().map(_.getLong(1)).sum > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q_user_event_path: one user_id exchange, no second shuffle") {
    val p = plan("q_user_event_path")
    assert("Exchange".r.findAllIn(p).length === 1, p)
  }

  test("q_emb_pca_project: per-row literal dot — no Generate before the census shuffle") {
    val p = plan("q_emb_pca_project")
    assert(!p.contains("Generate"), p)
    assert("Exchange".r.findAllIn(p).length === 1, p)
  }

  test("q_contamination: benchmark side broadcast, no cartesian/SMJ") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q_pack_sequences: prefix-sum window is partitioned by the shard") {
    val p = plan("q_pack_sequences")
    assert("Window .*\\[source".r.findFirstIn(p).isDefined ||
      p.contains("windowspecdefinition(source"), p)
  }

  test("per-row statistics plan with no shuffle exchange") {
    for (q <- Seq("q_txt_repetition", "q_emb_quantize_int8", "q_txt_pii_scrub",
        "q_txt_selfdedup")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffled:\n$p")
    }
  }

  test("q_sample_split: column pruning drops the text payload at the scan") {
    val p = plan("q_sample_split")
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse(p)
    assert(!readSchema.contains("text"), readSchema)
  }

  test("q_vocab_topk: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("q_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_txt_boilerplate: hot-set removal is a broadcast anti-join, no SMJ") {
    val p = plan("q_txt_boilerplate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_agg_hist_quantiles: windows run over aggregated bins, not raw rows") {
    val p = plan("q_agg_hist_quantiles")
    // the cumulative-walk Window must sit ABOVE the binned HashAggregate
    // (tree prints root-first: Window line before the first HashAggregate
    // would mean it consumed aggregated input)
    val w = p.indexOf("Window")
    val agg = p.indexOf("HashAggregate")
    assert(w >= 0 && agg >= 0, p)
    // raw-row windows would shuffle the full scan; the plan's only
    // exchanges must be hash-partitioned on aggregate/bin keys, tiny
    assert(!p.contains("rangepartitioning"), p) // no global sort anywhere
  }

  test("q_mm_search: probe side broadcasts; top-k is TakeOrdered") {
    val p = plan("q_mm_search")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_dedup_semantic: pair join is keyed on the cell, never cartesian") {
    val p = plan("q_dedup_semantic")
    // an equi-join on cell (any strategy) with the i<j residual — a
    // cartesian would mean the bucketing silently stopped restricting
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("cell"), p)
  }

  test("q_split_leakage_safe: cluster labels broadcast, no corpus shuffle join") {
    val p = plan("q_split_leakage_safe")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_mix_token_budget: window sits only on the boundary-bucket subset") {
    val p = plan("q_mix_token_budget")
    // the intra-bucket cumsum window partitions by the group key
    assert(p.contains("windowspecdefinition(grp") ||
      "Window .*\\[grp".r.findFirstIn(p).isDefined, p)
    // and no global sort anywhere (a corpus-wide rank would rangepartition)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("q_agg_heavy_hitters: sketch aggregates partially; recount join broadcasts") {
    val p = plan("q_agg_heavy_hitters")
    // the MG typed Aggregator must partial-aggregate map-side (O(cap)
    // state across the shuffle, the whole point of the sketch) ...
    assert("ObjectHashAggregate.*partial_mgaggregator".r.findFirstIn(
      p.toLowerCase.replaceAll("\\s+", " ")).isDefined ||
      p.contains("partial_mgaggregator") || p.contains("partial_MgAggregator"), p)
    // ... and the candidate recount must broadcast the ≤cap×groups
    // candidate set, never shuffle the token stream for the join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_join_fuzzy: signature equi-join, never an all-pairs product") {
    val p = plan("q_join_fuzzy")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("__sig"), p)
  }

  test("q_profile_numeric: no Expand; one column-pruned scan per column") {
    val p = plan("q_profile_numeric")
    // r11 measured decision: the one-scan multi-distinct form Expands
    // every row once per distinct column (5x rows through the distinct
    // hash aggregate — 3.0 s vs 0.3 s warm at sf0.1). The union form
    // plans one two-phase single-distinct aggregate per column, each
    // scan pruned to EXACTLY its one column — on columnar storage the
    // total bytes read match the single scan, so the 100 TB cost is
    // unchanged while the row volume through aggregation drops 5x.
    assert(!p.toLowerCase.contains("expand"), p)
    assert("Scan parquet".r.findAllIn(p).length === 4, p)
    Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
      .foreach { c =>
        assert(s"ReadSchema: struct<$c:[^,>]*>".r.findFirstIn(p).nonEmpty,
          s"scan not pruned to exactly [$c]:\n$p")
      }
  }

  test("q_a2_reagg_navigated: the inner hourly aggregate reads the rollup, not raw events") {
    try {
      val df = SparkEntry.queries("q_a2_reagg_navigated")(spark, sf)
      val p = df.queryExecution.optimizedPlan.toString
      // navigated: the only relation is the materialized rollup (hour,
      // event_type, sum_value) — no events-schema scan survives
      assert(p.contains("sum_value#"), s"not navigated:\n$p")
      assert(!p.contains("event_id"), s"raw events scan survived:\n$p")
      assert(df.collect().nonEmpty)
    } finally graft.plans.RollupNavigation.clear()
  }

  test("q_outlier_mad: both stat joins broadcast, never an SMJ of the facts") {
    val p = plan("q_outlier_mad")
    // med/mad are config-scale (one row per group) — they must come back
    // as broadcasts; a SortMergeJoin would shuffle the fact table twice
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_assoc_rules: basket pair join is keyed on the basket, no product") {
    val p = plan("q_assoc_rules")
    // the items×items pair stage must be an equi-join on the order key
    // (per-basket bounded candidates) — never a cartesian; the ONLY
    // nested-loop allowed is the deliberate 1-row totals cross join
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1, p)
    // support/total enrich comes back as broadcasts
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_cohort_retention: cohort sizes broadcast back, no extra fact shuffle") {
    val p = plan("q_cohort_retention")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_agg_exact_quantiles: one hit-bin scan, no full-table sort, spec broadcast") {
    val p = plan("q_agg_exact_quantiles")
    // pass 1 (bin metadata) ran eagerly at plan-build; the returned plan
    // must be ONE filtered scan + the tiny per-bin window + a broadcast
    // of the config-scale hit spec — never a global sort of the facts
    assert("Scan parquet".r.findAllIn(p).length === 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_attribution_linear: touch join equi on user, no product") {
    val p = plan("q_attribution_linear")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_mix_epochs: replication is one Generate riding the scan") {
    val p = plan("q_mix_epochs")
    assert("(?i)generate".r.findAllIn(p).length === 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_txt_entropy: doc totals join keeps the doc_id partitioning") {
    val p = plan("q_txt_entropy")
    // counts and totals are both keyed on doc_id — the join must not be
    // a nested loop, and the whole plan needs exactly one explode
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert("(?i)generate".r.findAllIn(p).length <= 2, p)
  }
}
