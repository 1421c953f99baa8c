package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** As-of join semantics: most recent right row at-or-before each left row,
  * per key; exact ties take the right row; no match -> null payload.
  * (Expected values cross-checked against DuckDB's native ASOF JOIN.)
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf attaches latest right payload <= left ts, null when none") {
    val l = Seq((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 09:00:00")))
      .toDF("uid", "ts")
    val r = Seq((1L, ts("2024-01-01 09:30:00")), (1L, ts("2024-01-01 11:00:00")),
      (3L, ts("2024-01-01 08:00:00")))
      .toDF("uid", "rts")
    val got = AsOfJoin.asOf(l, r, "uid", "ts", "rts", Seq("rts"))
      .orderBy("uid", "ts").collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).toString,
        Option(x.getTimestamp(2)).map(_.toString)))
    assert(got.toSeq === Seq(
      (1L, "2024-01-01 10:00:00.0", Some("2024-01-01 09:30:00.0")),
      (1L, "2024-01-01 12:00:00.0", Some("2024-01-01 11:00:00.0")),
      (2L, "2024-01-01 09:00:00.0", None)))
  }

  test("exact-timestamp tie: the right row at the same instant matches") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("uid", "ts")
    val r = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("uid", "rts")
    val got = AsOfJoin.asOf(l, r, "uid", "ts", "rts", Seq("rts")).collect()(0)
    assert(got.getTimestamp(2) != null)
  }

  test("multiple payload columns ride along") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("uid", "ts")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), "x", 7L))
      .toDF("uid", "rts", "tag", "v")
    val got = AsOfJoin.asOf(l, r, "uid", "ts", "rts", Seq("tag", "v")).collect()(0)
    assert(got.getAs[String]("tag_asof") === "x")
    assert(got.getAs[Long]("v_asof") === 7L)
  }
}
