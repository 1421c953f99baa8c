package graft

import org.apache.spark.sql.functions._
import graft.ops.Lookups

/** J1/J2: broadcast dimension lookups, reference sets, network hierarchy
  * (SURVEY §2.3).
  */
class LookupsSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq((1, "x"), (2, "y"), (99, "z")).toDF("k", "v")
  private def dim = Seq((1, "one"), (2, "two")).toDF("id", "name")

  test("lookup resolves via broadcast left join, null for missing keys") {
    val out = Lookups.lookup(facts, dim, "k", "id", "name", "kname")
      .orderBy("k").collect()
    assert(out.map(r => Option(r.getAs[String]("kname"))).toSeq ===
      Seq(Some("one"), Some("two"), None))
    assert(!out(0).schema.fieldNames.contains("__lk_key"))
  }

  test("inReferenceSet / notInReferenceSet partition the fact rows") {
    val refs = Seq("x", "y").toDF("m")
    val in = Lookups.inReferenceSet(facts, refs, "v").collect().map(_.getInt(0)).toSet
    val notIn = Lookups.notInReferenceSet(facts, refs, "v").collect().map(_.getInt(0)).toSet
    assert(in === Set(1, 2))
    assert(notIn === Set(99))
  }

  test("networkNameExpr does longest-prefix match with default") {
    val hierarchy = Seq(
      "10.0.0.0/8" -> "corp",
      "10.99.0.0/16" -> "dmz", // more specific wins despite listing order
      "192.168.0.0/16" -> "lab")
    val got = Seq("10.1.2.3", "10.99.1.1", "192.168.7.7", "8.8.8.8")
      .toDF("ip")
      .select(Lookups.networkNameExpr(hierarchy, col("ip")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("corp", "dmz", "lab", "other"))
  }
}
