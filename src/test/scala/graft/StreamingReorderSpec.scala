package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{StreamingBeacon, StreamingFirstSeen, StreamingFunnel}

/** Reorder tolerance of the ordered-topic streaming family (r11): a
  * DELIBERATELY SHUFFLED topic within the watermark delay folds to
  * exactly the in-order result (arrivals buffer in state and replay in
  * event-time order once the watermark passes), and an arrival BEYOND
  * the tolerance fails loud — never a silent mis-statement.
  */
class StreamingReorderSpec extends SparkSpec {
  import spark.implicits._

  private val B = 1700000000000000L // fixed micros base (UTC session TZ)
  private val H = 3600000000L       // one hour in micros

  test("funnel: shuffled delivery within lateness folds to the in-order stages") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val stages = StreamingFunnel.funnel(spark,
      input.toDF().toDF("user_id", "event_type", "t_us"),
      windowUs = 86400000000L, idleHorizonUs = 365L * 86400000000L,
      lateness = "1 hour")
    val q = stages.toDF().writeStream
      .format("memory").queryName("funnel_reorder").outputMode("update").start()
    try {
      // user 1's journey delivered BACKWARD across batches — legal: every
      // arrival stays above the (lateness-lagged) watermark
      input.addData((1L, "purchase", B + 400000000L))
      q.processAllAvailable()
      input.addData((1L, "view", B + 300000000L))
      q.processAllAvailable()
      input.addData((1L, "signup", B))
      q.processAllAvailable()
      // sentinel advances the watermark past user 1's events -> flush
      input.addData((99L, "signup", B + 3 * H))
      q.processAllAvailable()
      q.processAllAvailable() // settle the self-triggered flush batch
      val best = spark.table("funnel_reorder")
        .where("user_id = 1").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .maxBy(_._1)
      // exactly the in-order fold: signup -> view -> purchase
      assert(best === ((3L, B, B + 300000000L, B + 400000000L)))
    } finally q.stop()
  }

  test("first-seen: a late-but-in-tolerance earlier event wins the emitted day") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val pairs = StreamingFirstSeen.firstSeen(spark,
      input.toDF().toDF("user_id", "event_type", "t_us"),
      idleHorizonUs = 365L * 86400000000L, lateness = "48 hours")
    val q = pairs.toDF().writeStream
      .format("memory").queryName("firstseen_reorder").outputMode("append").start()
    try {
      // the LATER occurrence arrives first; the true first occurrence
      // (a day earlier) arrives in a later batch, within tolerance
      input.addData((1L, "login", B + 30 * H))
      q.processAllAvailable()
      input.addData((1L, "login", B))
      q.processAllAvailable()
      input.addData((99L, "x", B + 100 * H)) // watermark sentinel
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("firstseen_reorder")
        .where("user_id = 1").collect()
        .map(r => (r.getString(1), r.getLong(2)))
      // ONE emission, dated by the MINIMUM timestamp — the batch census
      assert(rows.toSeq === Seq(("login", B / 86400000000L)), rows.mkString(", "))
    } finally q.stop()
  }

  test("beacon: shuffled arrivals yield the in-order gap moments") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val rows = StreamingBeacon.gaps(spark,
      input.toDF().toDF("user_id", "t_us", "event_id"),
      idleHorizonUs = 365L * 86400000000L, lateness = "1 hour")
    val q = rows.toDF().writeStream
      .format("memory").queryName("beacon_reorder").outputMode("update").start()
    try {
      input.addData((1L, B + 120000000L, 3L))
      q.processAllAvailable()
      input.addData((1L, B, 1L), (1L, B + 60000000L, 2L))
      q.processAllAvailable()
      input.addData((99L, B + 3 * H, 9L))
      q.processAllAvailable()
      q.processAllAvailable()
      val best = spark.table("beacon_reorder")
        .where("user_id = 1").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).maxBy(_._1)
      // two 60s gaps in event-time order: n=2, sum=120, sumsq=7200
      assert(best === ((2L, 120L, 7200L)))
    } finally q.stop()
  }

  test("funnel: a beyond-tolerance arrival is DROPPED by the watermark contract, never mis-folded") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val stages = StreamingFunnel.funnel(spark,
      input.toDF().toDF("user_id", "event_type", "t_us"),
      windowUs = 86400000000L, idleHorizonUs = 365L * 86400000000L)
    val q = stages.toDF().writeStream
      .format("memory").queryName("funnel_late").outputMode("update").start()
    try {
      input.addData((1L, "view", B + 300000000L))
      q.processAllAvailable()
      // lateness = 0 -> watermark is at B+300s; the signup at B is
      // beyond tolerance. Spark's stateful-operator late filter drops
      // it BEFORE the state function (the standard watermark contract —
      // the old pre-buffering machine would instead have folded it out
      // of order and mis-stated the journey). The in-operator require
      // is defense-in-depth behind that filter.
      input.addData((1L, "signup", B))
      q.processAllAvailable()
      input.addData((99L, "signup", B + 3 * H)) // flush sentinel
      q.processAllAvailable()
      q.processAllAvailable()
      val best = spark.table("funnel_late")
        .where("user_id = 1").collect()
        .map(r => (r.getLong(1), r.getLong(2))).maxBy(_._1)
      // the dropped signup never opened the journey: stage stays 0 —
      // under-tolerance sizing LOSES data (visibly: t1 = -1), it never
      // CORRUPTS order
      assert(best === ((0L, -1L)), best)
    } finally q.stop()
  }
}
