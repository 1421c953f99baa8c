package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Lookups
import graft.streaming.StreamingJoins

/** Streaming joins: dim enrichment on a live stream (broadcast per batch)
  * and the stateful stream-stream interval join.
  */
class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("Lookups.lookup enriches a stream against a static dim verbatim") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val dim = Seq((7L, "NATION_7"), (9L, "NATION_9")).toDF("id", "name")
    val enriched = Lookups.lookup(
      input.toDF().toDF("event_id", "domain_id"), dim,
      "domain_id", "id", "name", "domain_name")
    val q = enriched.writeStream
      .format("memory").queryName("sj_enrich").outputMode("append").start()
    try {
      input.addData((1L, 7L), (2L, 9L), (3L, 5L))
      q.processAllAvailable()
      val got = spark.table("sj_enrich").collect()
        .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("domain_name")))
        .toMap
      assert(got === Map(1L -> Some("NATION_7"), 2L -> Some("NATION_9"), 3L -> None))
    } finally q.stop()
  }

  test("interval join pairs events within the window, drops outside") {
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp)]
    val signups = MemoryStream[(Long, Timestamp)]
    val joined = StreamingJoins.intervalJoin(
      purchases.toDF().toDF("p_user", "p_ts"),
      signups.toDF().toDF("s_user", "s_ts"),
      "p_user", "s_user", "p_ts", "s_ts", windowSec = 3600)
    val q = joined.writeStream
      .format("memory").queryName("sj_interval").outputMode("append").start()
    try {
      signups.addData(
        (1L, ts("2024-07-24 09:30:00")),  // 40 min before -> in window
        (2L, ts("2024-07-24 07:00:00")),  // 3h10m before -> outside
        (3L, ts("2024-07-24 11:00:00")))  // after the purchase -> outside
      purchases.addData(
        (1L, ts("2024-07-24 10:10:00")),
        (2L, ts("2024-07-24 10:10:00")),
        (3L, ts("2024-07-24 10:10:00")))
      q.processAllAvailable()
      val got = spark.table("sj_interval").collect()
        .map(_.getAs[Long]("p_user")).toSet
      assert(got === Set(1L))
    } finally q.stop()
  }

  test("interval join resolves identical column names on both sides") {
    implicit val ctx = spark.sqlContext
    // both streams carry the SAME schema (user_id, ts) — the common case;
    // the join condition must be frame-qualified, not bare col() names
    val purchases = MemoryStream[(Long, Timestamp)]
    val signups = MemoryStream[(Long, Timestamp)]
    val joined = StreamingJoins.intervalJoin(
      purchases.toDF().toDF("user_id", "ts"),
      signups.toDF().toDF("user_id", "ts"),
      "user_id", "user_id", "ts", "ts", windowSec = 3600)
    val q = joined.writeStream
      .format("memory").queryName("sj_samecols").outputMode("append").start()
    try {
      signups.addData((1L, ts("2024-07-24 09:30:00")), (2L, ts("2024-07-24 07:00:00")))
      purchases.addData((1L, ts("2024-07-24 10:10:00")), (2L, ts("2024-07-24 10:10:00")))
      q.processAllAvailable()
      assert(spark.table("sj_samecols").collect()
        .map(_.getAs[Long](0)).toSet === Set(1L))
    } finally q.stop()
  }
}
