package graft.tools

import org.apache.spark.sql.functions._

/** Attribution of the nav-family FIXED per-query cost (r13 verdict: every
  * q_a2_nav_* reads ~0.38-0.56 s vs ~0.2 s raw at sf0.1 — ~0.25 s of rule +
  * freshness + ladder overhead on top of tiny rollup scans).
  *
  * Times, warm, at the given fixture dir:
  *   register   — registerStatsLadder alone (what every nav query re-pays)
  *   plan       — optimized+physical planning of the navigated dashboard
  *                (rule matching + freshness probes), no execution
  *   exec       — the navigated query end-to-end (plan + execute)
  *   exec-noreg — same, but WITHOUT re-registering first (the part a
  *                registration memo cannot remove)
  */
object NavOverhead {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q() = graft.SparkEntry.queries("q_a2_nav_filtered")(spark, dir)
    // arm everything once (ladder build + codegen + page cache)
    q().collect()

    def time(label: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"NAVOH $label%-12s min=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f max=${ts.max}%.3f")
    }

    // the query body minus navigationReady (mirror of q_a2_nav_filtered)
    def bare() = graft.queries.Enrich
      .securityEvents(graft.sources.Tables.events(spark, dir))
      .filter(col("event_type").isin("view", "click"))
      .groupBy(date_trunc("day", col("ts")).as("day0"), col("event_type"))
      .agg(sum("value").as("sv"))
      .select(date_format(col("day0"), "yyyy-MM-dd").as("day"),
        col("event_type"), round(col("sv"), 2).as("sum_value"))

    time("exec")       { q().collect() }
    time("exec-noreg") { bare().collect() }
    time("plan-only")  { bare().queryExecution.executedPlan }
    val before = graft.plans.RollupNavigation.deepListings.get()
    time("register")   { graft.queries.EventQueries.navReadyForDiag(spark, dir) }
    println(s"NAVOH deepListings over register reps: ${graft.plans.RollupNavigation.deepListings.get() - before}")
    spark.stop()
  }
}
