package graft

import graft.sources.Tables

/** S4/S5: dynamic-schema JSON ingestion — the schema must be the UNION over
  * all rows/files, fixing the reference's first-row-only inference
  * (reference clickhouse/helpers.py:166-169 silently drops keys that first
  * appear in later rows).
  */
class TablesSpec extends SparkSpec {

  test("readJsonUnioned unions ragged schemas across rows and files") {
    val dir = java.nio.file.Files.createTempDirectory("ragged_json")
    java.nio.file.Files.writeString(dir.resolve("a.json"),
      """{"id": 1, "early_key": "x"}
        |{"id": 2, "late_key": 7}""".stripMargin)
    java.nio.file.Files.writeString(dir.resolve("b.json"),
      """{"id": 3, "file2_only": true, "early_key": "y"}""")
    val df = Tables.readJsonUnioned(spark, dir.toString)
    assert(df.columns.sorted.toSeq ===
      Seq("early_key", "file2_only", "id", "late_key"))
    assert(df.count() === 3)
    // rows lacking a key read as null, not dropped
    assert(df.filter(df("late_key").isNotNull).count() === 1)
  }

  test("pinned schema overrides inference for streaming use") {
    val dir = java.nio.file.Files.createTempDirectory("pinned_json")
    java.nio.file.Files.writeString(dir.resolve("a.json"),
      """{"id": 1, "extra": "dropped"}""")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val df = Tables.readJsonUnioned(spark, dir.toString, Some(schema))
    assert(df.columns.toSeq === Seq("id"))
  }
}
