package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup

/** Streaming exact dedup: in-batch and cross-batch duplicates inside the
  * watermark horizon collapse to the first arrival.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("duplicate content within the horizon is dropped, firsts survive") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamingDedup.exact(
      input.toDF().toDF("ts", "id", "text"), "ts", "text", lateness = "1 hour")
    val q = deduped.writeStream
      .format("memory").queryName("sdedup").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-07-24 10:00:00"), 1L, "alpha"),
        (ts("2024-07-24 10:01:00"), 2L, "alpha"), // in-batch dup
        (ts("2024-07-24 10:02:00"), 3L, "beta"))
      q.processAllAvailable()
      input.addData(
        (ts("2024-07-24 10:10:00"), 4L, "alpha"), // cross-batch dup, in horizon
        (ts("2024-07-24 10:11:00"), 5L, "gamma"))
      q.processAllAvailable()

      val ids = spark.table("sdedup").collect().map(_.getAs[Long]("id")).toSet
      assert(ids === Set(1L, 3L, 5L))
      // schema passes through, helper column dropped
      assert(spark.table("sdedup").columns.toSeq === Seq("ts", "id", "text"))
    } finally q.stop()
  }
}
