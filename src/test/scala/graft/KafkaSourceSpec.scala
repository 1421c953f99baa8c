package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{KafkaSource, StreamingRollup}

/** S1 Kafka-source read path, proven broker-free: decodeJson maps the
  * Kafka wire shape (a `value` column of JSON records) to typed rows with
  * pure column expressions, so MemoryStream + decode + rollup pins the
  * exact semantics the `format("kafka")` wiring would execute.
  */
class KafkaSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("dim", StringType),
    StructField("cnt", LongType)))
  private val opts = Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss")

  test("decodeJson: typed rows out, corrupt records dropped (batch mode)") {
    val frames = Seq(
      """{"ts":"2024-07-24 10:05:00","dim":"a","cnt":1}""",
      """{"ts":"2024-07-24 10:45:00","dim":"b","cnt":2}""",
      """not json at all""").toDF("value")
    val out = KafkaSource.decodeJson(frames, schema, options = opts)
    assert(out.columns.toSeq === Seq("ts", "dim", "cnt"))
    val rows = out.collect().map(r => (r.getAs[String]("dim"), r.getAs[Long]("cnt"))).toSet
    assert(rows === Set(("a", 1L), ("b", 2L)))
    val kept = KafkaSource.decodeJson(frames, schema, dropCorrupt = false, options = opts)
    assert(kept.count() === 3)
  }

  test("MemoryStream value frames -> decode -> hourly rollup parity with batch") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val decoded = KafkaSource.decodeJson(input.toDF().toDF("value"), schema, options = opts)
    val rollup = StreamingRollup.hourly(decoded, "ts", "cnt", Seq("dim"),
      lateness = "30 minutes", sumColName = "sv")
    val q = rollup.writeStream
      .format("memory").queryName("kafka_decode_rollup").outputMode("append").start()
    try {
      input.addData(
        """{"ts":"2024-07-24 10:05:00","dim":"a","cnt":1}""",
        """{"ts":"2024-07-24 10:45:00","dim":"a","cnt":2}""",
        """{"ts":"2024-07-24 10:50:00","dim":"b","cnt":4}""",
        """garbage that must not poison the window""")
      q.processAllAvailable()
      // push the watermark far past hour 10 so the window closes
      input.addData("""{"ts":"2024-07-24 15:00:00","dim":"z","cnt":0}""")
      q.processAllAvailable()
      input.addData("""{"ts":"2024-07-24 16:00:00","dim":"z","cnt":0}""")
      q.processAllAvailable()
      val streamed = spark.table("kafka_decode_rollup")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .filter(_._1.startsWith("2024-07-24 10")).toSet
      val batch = graft.ops.Rollup.hourly(
          Seq((Timestamp.valueOf("2024-07-24 10:05:00"), "a", 1L),
            (Timestamp.valueOf("2024-07-24 10:45:00"), "a", 2L),
            (Timestamp.valueOf("2024-07-24 10:50:00"), "b", 4L))
            .toDF("ts", "dim", "cnt"),
          "ts", "cnt", Seq("dim"), hourColName = "hour", sumColName = "sv")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
