package graft

import org.apache.spark.sql.functions._
import graft.ops.Rollup

/** A1/A2: hourly SummingMergeTree rollup semantics (SURVEY §2.4;
  * reference clickhouse/clickhouse.py:70-81).
  */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    ("2024-07-24 10:05:00", "a", 1L),
    ("2024-07-24 10:55:00", "a", 2L),
    ("2024-07-24 10:59:00", "b", 4L),
    ("2024-07-24 11:01:00", "a", 8L),
    ("2024-07-25 10:05:00", "a", 16L))
    .toDF("s", "dim", "cnt")
    .select(to_timestamp(col("s")).as("ts"), col("dim"), col("cnt"))

  test("hourly rollup groups by hour + dims and sums the measure") {
    val got = Rollup.hourly(events, "ts", "cnt", Seq("dim"),
        hourColName = "h", sumColName = "sum_cnt")
      .select(col("h").cast("string"), col("dim"), col("sum_cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      ("2024-07-24 10:00:00", "a", 3L),
      ("2024-07-24 10:00:00", "b", 4L),
      ("2024-07-24 11:00:00", "a", 8L),
      ("2024-07-25 10:00:00", "a", 16L)))
  }

  test("default dims = all non-time non-measure columns (SummingMergeTree key)") {
    val got = Rollup.hourly(events, "ts", "cnt")
    assert(got.columns.toSeq === Seq("hour", "dim", "sum_value"))
  }

  test("sum preservation: rollup total equals raw total at any partitioning") {
    val raw = events.agg(sum("cnt")).collect()(0).getLong(0)
    Seq(1, 3, 7).foreach { parts =>
      val rolled = Rollup.hourly(events.repartition(parts), "ts", "cnt", Seq("dim"))
        .agg(sum("sum_value")).collect()(0).getLong(0)
      assert(rolled === raw)
    }
  }

  test("saltedSum equals direct sum on skewed keys, any salt width") {
    val skewed = (1 to 5000).map(i => (if (i % 100 == 0) "rare" else "hot", i.toLong))
      .toDF("k", "v")
    val direct = skewed.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(1, 4, 32).foreach { buckets =>
      val salted = Rollup.saltedSum(skewed, Seq("k"), "v", "s", buckets)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(salted === direct, s"buckets=$buckets")
    }
  }

  test("sessionize splits on gap, numbers islands per key") {
    val ev = Seq(
      (1L, "2024-07-24 10:00:00"), (1L, "2024-07-24 10:10:00"), // session 1
      (1L, "2024-07-24 11:00:00"),                              // session 2 (50m gap)
      (2L, "2024-07-24 10:00:00"))                              // own session
      .toDF("user_id", "s")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"))
    val got = Rollup.sessionize(ev, "user_id", "ts", gapSeconds = 1800L)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts").toString,
        r.getAs[Long]("session_id"))).toSet
    assert(got === Set(
      (1L, "2024-07-24 10:00:00.0", 1L),
      (1L, "2024-07-24 10:10:00.0", 1L),
      (1L, "2024-07-24 11:00:00.0", 2L),
      (2L, "2024-07-24 10:00:00.0", 1L)))
  }

  test("re-aggregation idempotence: daily reagg of hourly == direct daily") {
    val hourly = Rollup.hourly(events, "ts", "cnt", Seq("dim"),
      hourColName = "hour", sumColName = "sv")
    val daily = Rollup.reaggregate(hourly, "hour", "sv", "day", Seq("dim"), "d")
      .select(col("d").cast("string"), col("dim"), col("sv"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val direct = events.groupBy(date_trunc("day", col("ts")).as("d"), col("dim"))
      .agg(sum("cnt").as("sv"))
      .select(col("d").cast("string"), col("dim"), col("sv"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(daily === direct)
  }
}
