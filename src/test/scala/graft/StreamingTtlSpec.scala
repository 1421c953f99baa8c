package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{StreamingBeacon, StreamingFunnel}

/** Event-time TTL on the long-lived per-user accumulators
  * (StreamingFunnel / StreamingBeacon): a key idle past the horizon emits
  * its final monotone row once more and its state is DROPPED — the state
  * store is bounded by the active-key universe, not the all-time one.
  * A key reappearing after expiry starts a fresh journey/accumulator —
  * that reset is the observable proof the state row was removed.
  */
class StreamingTtlSpec extends SparkSpec {
  import spark.implicits._

  private val B = 1700000000000000L // fixed micros base (UTC session TZ)
  private val H = 3600000000L       // one hour in micros

  test("funnel: idle user expires (final row re-emitted), reappearance restarts the journey") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val stages = StreamingFunnel.funnel(spark,
      input.toDF().toDF("user_id", "event_type", "t_us"),
      windowUs = 86400000000L, idleHorizonUs = H)
    val q = stages.toDF().writeStream
      .format("memory").queryName("funnel_ttl").outputMode("update").start()
    try {
      // batch 1: user 1 reaches stage 2; user 2 stage 1
      input.addData((1L, "signup", B), (1L, "view", B + 300000000L),
        (2L, "signup", B))
      q.processAllAvailable()
      // batch 2 advances max event time to B+3H (watermark still at batch-1
      // max during this trigger); batch 3's trigger then runs with the
      // watermark at B+3H — past both users' last+1h — and expires them
      input.addData((99L, "signup", B + 3 * H))
      q.processAllAvailable()
      input.addData((99L, "view", B + 4 * H))
      q.processAllAvailable()
      // batch 4: user 1 reappears — state was dropped, so this signup
      // opens a FRESH journey (t1 reset, t2 gone)
      input.addData((1L, "signup", B + 4 * H + H / 2))
      q.processAllAvailable()

      val rows = spark.table("funnel_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // expiry re-emitted user 1's final stage-2 row (batch-1 emission +
      // the timeout emission = at least two identical rows)
      val u1stage2 = rows.count(_ == ((1L, 2L, B, B + 300000000L)))
      assert(u1stage2 >= 2, rows.mkString(", "))
      // the reappearance row proves the old state is gone: stage restarts
      // at 1 with the NEW t1 and no view timestamp
      assert(rows.contains((1L, 1L, B + 4 * H + H / 2, -1L)),
        rows.mkString(", "))
    } finally q.stop()
  }

  test("first-seen: within-horizon dedup, post-expiry reappearance re-emits as new") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val pairs = graft.streaming.StreamingFirstSeen.firstSeen(spark,
      input.toDF().toDF("user_id", "event_type", "t_us"), idleHorizonUs = H)
    val q = pairs.toDF().writeStream
      .format("memory").queryName("firstseen_ttl").outputMode("append").start()
    try {
      // batch 1: two events of the same type — exactly ONE emission
      input.addData((1L, "login", B), (1L, "login", B + 60000000L))
      q.processAllAvailable()
      // a repeat in a later batch stays deduped (state remembers)
      input.addData((1L, "login", B + 2 * H))
      q.processAllAvailable()
      // advance the watermark far past user 1's last + horizon
      input.addData((99L, "x", B + 6 * H))
      q.processAllAvailable()
      input.addData((99L, "x", B + 7 * H)) // trigger: user 1 expires
      q.processAllAvailable()
      // post-expiry: the SAME type re-emits — novelty is horizon-scoped
      input.addData((1L, "login", B + 8 * H))
      q.processAllAvailable()

      val rows = spark.table("firstseen_ttl").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val u1 = rows.filter(_._1 == 1L).sortBy(_._3)
      assert(u1.length === 2, rows.mkString(", "))
      assert(u1(0)._3 === B / 86400000000L)
      assert(u1(1)._3 === (B + 8 * H) / 86400000000L)
    } finally q.stop()
  }

  test("beacon: idle key expires; post-expiry gaps never bridge the horizon") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val moments = StreamingBeacon.gaps(spark,
      input.toDF().toDF("user_id", "t_us", "event_id"),
      idleHorizonUs = H)
    val q = moments.toDF().writeStream
      .format("memory").queryName("beacon_ttl").outputMode("update").start()
    try {
      // batch 1: one 60s gap for user 1
      input.addData((1L, B, 1L), (1L, B + 60000000L, 2L))
      q.processAllAvailable()
      input.addData((99L, B + 3 * H, 3L))
      q.processAllAvailable()
      input.addData((99L, B + 4 * H, 4L)) // trigger runs: user 1 expires
      q.processAllAvailable()
      // batch 4: user 1 reappears with a 30s gap — fresh accumulators:
      // neither the pre-expiry gap (60s) nor the hours-long idle gap may
      // appear in the new state
      input.addData((1L, B + 5 * H, 5L), (1L, B + 5 * H + 30000000L, 6L))
      q.processAllAvailable()

      val rows = spark.table("beacon_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // final emission before expiry re-emitted (n=1, sg=60, sgg=3600)
      assert(rows.count(_ == ((1L, 1L, 60L, 3600L))) >= 2, rows.mkString(", "))
      // fresh accumulator after expiry: exactly the 30s gap, nothing more
      assert(rows.contains((1L, 1L, 30L, 900L)), rows.mkString(", "))
      assert(!rows.exists(r => r._1 == 1L && r._2 >= 2L), rows.mkString(", "))
    } finally q.stop()
  }
}
