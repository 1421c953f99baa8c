package graft

import org.apache.spark.sql.functions._
import graft.plans.RollupNavigation

/** Aggregate navigation: an hour-or-coarser groupBy-SUM over the
  * registered raw frame rewrites onto the materialized hourly rollup
  * (plan-pinned), results bit-identical, and the rule STANDS DOWN when
  * the raw store's signature no longer matches the registration (stale
  * rollup) or when the shape can't be served (filter, non-sum).
  */
class RollupNavigationSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_nav_").toString
    val raw = s"$root/events"; val roll = s"$root/rollup"
    val base = 1700000000000000L
    (0 until 5000).map { i =>
      (new java.sql.Timestamp(base / 1000 + i * 97000L),
        if (i % 3 == 0) "view" else "purchase", (i % 50) / 10.0)
    }.toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(raw)
    spark.read.parquet(raw)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(sum("value").as("sum_value"))
      .write.mode("overwrite").parquet(roll)
    (raw, roll)
  }

  private def dayAgg(raw: String) =
    spark.read.parquet(raw)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(sum("value").as("s"))

  test("day-grain SUM over raw navigates to the rollup; values identical; stale gate stands down") {
    val (raw, roll) = fixture()
    // double sums re-associate under navigation (hourly partials first),
    // moving the last ulps — compare under the engine's 2-dp rounding
    // discipline, the same contract q_a2's oracle runs under; integer /
    // decimal measures re-aggregate bit-identically
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0), r.getString(1),
        math.round(r.getDouble(2) * 100))).toSet
    val expected = rows(dayAgg(raw))
    try {
      RollupNavigation.register(spark, spark.read.parquet(raw), "ts",
        Seq("event_type"), "value", roll, "hour", "sum_value")
      val q = dayAgg(raw)
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("sum_value"), s"not navigated:\n$plan")
      assert(!plan.contains("ts#"), s"raw scan survived navigation:\n$plan")
      assert(rows(q) === expected)

      // hour-grain (the rollup's own grain) navigates too
      val hq = spark.read.parquet(raw)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(sum("value").as("s"))
      assert(hq.queryExecution.optimizedPlan.toString.contains("sum_value"))

      // STALE: a new file landing in the raw store flips the signature
      Seq((new java.sql.Timestamp(1700990000000L), "view", 1.0))
        .toDF("ts", "event_type", "value")
        .write.mode("append").parquet(raw)
      val p2 = dayAgg(raw).queryExecution.optimizedPlan.toString
      assert(p2.contains("ts#") && !p2.contains("sum_value"),
        s"rule must stand down on a stale rollup:\n$p2")
    } finally RollupNavigation.clear()
  }

  test("navigation declines shapes the rollup cannot serve exactly") {
    val (raw, roll) = fixture()
    try {
      RollupNavigation.register(spark, spark.read.parquet(raw), "ts",
        Seq("event_type"), "value", roll, "hour", "sum_value")
      // row-level filter between aggregate and scan
      val f = spark.read.parquet(raw).filter(col("value") > 2.0)
        .groupBy(date_trunc("day", col("ts"))).agg(sum("value"))
      assert(!f.queryExecution.optimizedPlan.toString.contains("sum_value"))
      // sub-hour grain
      val m = spark.read.parquet(raw)
        .groupBy(date_trunc("minute", col("ts"))).agg(sum("value"))
      assert(!m.queryExecution.optimizedPlan.toString.contains("sum_value"))
      // non-sum aggregate
      val a = spark.read.parquet(raw)
        .groupBy(date_trunc("day", col("ts"))).agg(avg("value"))
      assert(!a.queryExecution.optimizedPlan.toString.contains("sum_value"))
      // grouping by a column the rollup doesn't carry
      val g = spark.read.parquet(raw)
        .groupBy(date_trunc("day", col("ts")), col("value"))
        .agg(sum("value"))
      assert(!g.queryExecution.optimizedPlan.toString.contains("sum_value"))
    } finally RollupNavigation.clear()
  }
}
