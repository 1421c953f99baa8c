package graft

import org.apache.spark.sql.functions._
import graft.ops.{Fuzzy, Sampling}

/** SymSpell fuzzy join (deletion-signature blocking == brute-force
  * all-pairs lev ≤ 1) and priority sampling (exact integral quotient,
  * weight-proportional inclusion).
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("deletionSigs: identity + each single deletion, empty-safe") {
    val got = Seq("abc", "a", "").toDF("t")
      .select(col("t"), Fuzzy.deletionSigs(col("t")).as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("abc").toSet === Set("abc", "bc", "ac", "ab"))
    assert(got("a").toSet === Set("a", ""))
    assert(got("") === Seq(""))
  }

  test("signature join == brute-force all-pairs at lev <= 1") {
    // vocabulary with planted neighbors: substitutions, insertions,
    // deletions, and far-apart words
    val words = Seq("table", "tible", "tables", "able", "chair", "chars",
      "chart", "char", "spark", "spars", "sparse", "x", "y", "xy")
    val df = words.toDF("w")
    val brute = df.as("a").crossJoin(df.as("b"))
      .filter(levenshtein(col("a.w"), col("b.w")) <= 1 &&
        col("a.w") < col("b.w"))
      .select(col("a.w").as("l"), col("b.w").as("r"))
      .as[(String, String)].collect().toSet
    val fuzzy = Fuzzy.joinWithin1(
        df.select(col("w").as("wl")), "wl", df.select(col("w").as("wr")), "wr")
      .filter(col("wl") < col("wr"))
      .as[(String, String)].collect().toSet
    assert(fuzzy === brute)
    assert(brute.contains(("table", "tible")) && brute.contains(("char", "chart")))
  }

  test("priority == exact integral md5-div-weight; heavier rows sampled more") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5Long(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val rows = (1 to 400).map(i => (i.toLong, if (i % 2 == 0) 100L else 1L))
    val got = rows.toDF("id", "w").repartition(5)
      .select(col("id"), col("w"), Sampling.priority(col("id"), col("w")).as("p"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, w, p) => assert(p === md5Long(id.toString) / w) }
    // keep the 100 smallest priorities: weight-100 rows should dominate
    val kept = got.sortBy(r => (r._3, r._1)).take(100)
    val heavy = kept.count(_._2 == 100L)
    assert(heavy > 80, s"weight-100 rows in top-100: $heavy")
  }
}
