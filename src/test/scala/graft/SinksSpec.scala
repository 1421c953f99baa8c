package graft

import org.apache.spark.sql.functions._
import graft.ops.Rollup

/** S7/A3: day-partitioned parquet retention write (MergeTree analog). */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitionedByDay produces prunable day partitions") {
    val path = java.nio.file.Files.createTempDirectory("a3_sink").toString
    val df = Seq(
      ("2024-07-24 10:00:00", 1L), ("2024-07-24 23:59:59", 2L),
      ("2024-07-25 00:00:00", 4L))
      .toDF("s", "v").select(to_timestamp(col("s")).as("ts"), col("v"))
    Rollup.writePartitionedByDay(df, "ts", path)

    // physical layout: one directory per day
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.toSeq === Seq("yyyymmdd=20240724", "yyyymmdd=20240725"))

    // a day filter prunes to one partition at planning time
    val read = spark.read.parquet(path).filter(col("yyyymmdd") === "20240724")
    assert(read.collect().map(_.getAs[Long]("v")).sorted.toSeq === Seq(1L, 2L))
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
  }

  test("q_p8 plan prunes day partitions via PartitionFilters, no data filter") {
    val df = graft.SparkEntry.queries("q_p8_partition_pruning")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the day range must land in PartitionFilters (pruned at planning),
    // with a non-empty predicate on the partition column
    assert(plan.contains("PartitionFilters: ["), plan)
    val pf = plan.split("PartitionFilters: ")(1)
    assert(pf.contains("yyyymmdd"), plan)
    assert(df.collect().map(_.getAs[Long]("n")).sum > 0)
  }
}
