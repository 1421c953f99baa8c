package graft

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** F1/F4/F9: epoch heuristic, previous-Saturday anchor, partition keys
  * (SURVEY §2.5; reference semantics clickhouse/helpers.py:53-116).
  */
class TimeFnsSpec extends SparkSpec {
  import spark.implicits._

  test("epoch ms-vs-s heuristic: >1e10 means milliseconds") {
    // 1721779200 = 2024-07-24T00:00:00Z in seconds; same instant in ms
    val rows = Seq(1721779200L, 1721779200000L, 10000000000L, 10000000001L)
    val got = rows.toDF("e")
      .select(TimeFns.epochToTimestamp(col("e")).cast("string").as("ts"))
      .collect().map(_.getString(0))
    assert(got(0) === got(1)) // s and ms forms of one instant agree
    // 1e10 exactly is NOT > 1e10 => seconds => year 2286
    assert(got(2).startsWith("2286-11-20"))
    // 1e10+1 => milliseconds => 1970-04-26
    assert(got(3).startsWith("1970-04-26"))
  }

  test("prevSaturday matches dateutil SA(-1) on every weekday") {
    // dateutil SA(-1) from a Saturday returns the SAME day
    val days = (0 until 14).map(i => LocalDate.of(2024, 7, 1).plusDays(i))
    val got = days.map(_.toString).toDF("d")
      .select(TimeFns.prevSaturday(to_date(col("d"))).cast("string").as("w"))
      .collect().map(_.getString(0))
    days.zip(got).foreach { case (d, w) =>
      val want = d.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.SATURDAY))
      assert(w === want.toString, s"for $d")
      assert(LocalDate.parse(w).getDayOfWeek === DayOfWeek.SATURDAY)
    }
  }

  test("ddMMyyyy / toYYYYMMDD / toStartOfHour formats") {
    val got = Seq("2024-07-24 13:45:56").toDF("s")
      .select(
        TimeFns.ddMMyyyy(to_timestamp(col("s"))).as("r"),
        TimeFns.toYYYYMMDD(to_timestamp(col("s"))).as("p"),
        TimeFns.toStartOfHour(to_timestamp(col("s"))).cast("string").as("h"))
      .collect()(0)
    assert(got.getString(0) === "24/07/2024")
    assert(got.getString(1) === "20240724")
    assert(got.getString(2) === "2024-07-24 13:00:00")
  }
}
