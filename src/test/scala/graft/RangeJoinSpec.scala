package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Binned interval join: exactness vs the naive range join, edge bins,
  * and the no-nested-loop plan property.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  private def points = Seq(
    (1L, "2024-01-01 00:00:00"),
    (2L, "2024-01-01 00:29:59"),
    (3L, "2024-01-01 00:30:00"),  // exactly on a bin boundary
    (4L, "2024-01-01 01:15:00"),
    (5L, "2024-01-01 09:00:00"))
    .toDF("pid", "pts").withColumn("pts", to_timestamp(col("pts")))

  private def intervals = Seq(
    (10L, "2024-01-01 00:00:00", "2024-01-01 00:30:00"), // half-open: excludes pid 3
    (20L, "2024-01-01 00:15:00", "2024-01-01 01:20:00"), // spans 3 bins
    (30L, "2024-01-01 05:00:00", "2024-01-01 05:30:00")) // empty window
    .toDF("iid", "lo", "hi")
    .withColumn("lo", to_timestamp(col("lo")))
    .withColumn("hi", to_timestamp(col("hi")))

  test("intervalJoin == naive range join, each match exactly once") {
    val binned = RangeJoin.intervalJoin(points, intervals,
        "pts", "lo", "hi", binSeconds = 1800L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = points.join(intervals,
        col("pts") >= col("lo") && col("pts") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.sorted.toSeq === naive.sorted.toSeq)
    assert(binned.length === binned.distinct.length) // no duplicate matches
    assert(binned.toSet === Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (4L, 20L)))
  }

  test("half-open upper bound: a point at exactly hi does not match") {
    val out = RangeJoin.intervalJoin(points, intervals,
      "pts", "lo", "hi", binSeconds = 1800L)
    assert(!out.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).contains((3L, 10L)))
  }

  test("bin width much smaller than intervals still exact (more bins/interval)") {
    val binned = RangeJoin.intervalJoin(points, intervals,
        "pts", "lo", "hi", binSeconds = 60L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned === Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (4L, 20L)))
  }

  test("q_join_interval plans as an equi-join on the bin — no nested loop") {
    val p = SparkEntry.queries("q_join_interval")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    graft.ops.CacheRegistry.drain()
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
