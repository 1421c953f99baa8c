package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StatefulSessionize

/** Custom-state streaming sessions: gap-split within a batch, event-time
  * timeout closes open sessions once the watermark passes last+gap.
  */
class StatefulSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions close on gap within batch and on event-time timeout") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = StatefulSessionize.sessionize(
      spark, input.toDF().toDF("user_id", "ts"), gapSeconds = 1800L,
      lateness = "10 minutes")
    val q = sessions.writeStream
      .format("memory").queryName("sessions_mem").outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-07-24 10:00:00")), (1L, ts("2024-07-24 10:10:00")),
        (1L, ts("2024-07-24 11:30:00")), // > 30m gap: splits in-batch
        (2L, ts("2024-07-24 10:00:00")))
      q.processAllAvailable()
      // advance watermark far past 11:30 + 30m gap to time out open sessions
      input.addData((99L, ts("2024-07-24 15:00:00")))
      q.processAllAvailable()
      input.addData((99L, ts("2024-07-24 16:00:00")))
      q.processAllAvailable()

      val got = spark.table("sessions_mem")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3)))
        .toSet
      // in-batch split emitted immediately:
      assert(got.contains((1L, "2024-07-24 10:00:00.0", "2024-07-24 10:10:00.0", 2L)))
      // timeout-closed sessions:
      assert(got.contains((1L, "2024-07-24 11:30:00.0", "2024-07-24 11:30:00.0", 1L)))
      assert(got.contains((2L, "2024-07-24 10:00:00.0", "2024-07-24 10:00:00.0", 1L)))
    } finally q.stop()
  }
}
