package graft

import org.apache.spark.sql.functions._
import graft.ops.Normalize

/** F2/F3/F6/F1: rename map, identifier cleaning, name sanitizer, date
  * derivation (SURVEY §2.5; reference clickhouse/helpers.py:11-95,
  * etl.py:68-77).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("renameEvents applies the reference rename map") {
    val df = Seq((1L, 2L, 3L)).toDF("qid", "SUM_eventCount", "destinationPort")
    val out = Normalize.renameEvents(df)
    assert(out.columns.toSeq === Seq("QID", "Event Count", "Destination Port"))
  }

  test("renameEvents case-merge: first position, LAST source values (dict overwrite)") {
    // python dict comprehension: repeated target keeps first insertion
    // position but the LAST value wins (reference helpers.py:49)
    val df = Seq((1L, 2L, 3L)).toDF("userName", "qid", "username")
    val out = Normalize.renameEvents(df)
    assert(out.columns.toSeq === Seq("Username", "QID"))
    assert(out.collect()(0).getLong(0) === 3L) // username's value
  }

  test("renameEvents totality: unmapped columns pass through unchanged") {
    val df = Seq((1L, 2L)).toDF("unmapped_col", "qid")
    assert(Normalize.renameEvents(df).columns.toSeq === Seq("unmapped_col", "QID"))
  }

  test("cleanColumnName strips ' / ( ) ,' to underscores") {
    assert(Normalize.cleanColumnName("DomainName(DomainID)") === "DomainName_DomainID_")
    assert(Normalize.cleanColumnName("a b/c(d),e") === "a_b_c_d__e")
  }

  test("sanitizeName strips space quote dquote amp underscore") {
    assert(Normalize.sanitizeName("""Cu st_om"er&'x""") === "Customerx")
    val got = Seq("""Cu st_om"er&'x""").toDF("n")
      .select(Normalize.sanitizeNameCol(col("n"))).collect()(0).getString(0)
    assert(got === "Customerx")
  }

  test("addDateCols derives ReportDate + WeekFrom from epoch, errors when missing") {
    val df = Seq(1721779200L).toDF("Start Time") // 2024-07-24 (Wednesday)
    val out = Normalize.addDateCols(df).collect()(0)
    assert(out.getAs[String]("ReportDate") === "24/07/2024")
    assert(out.getAs[String]("WeekFrom") === "20/07/2024") // prior Saturday
    intercept[IllegalArgumentException] {
      Normalize.addDateCols(Seq(1L).toDF("other"))
    }
  }
}
