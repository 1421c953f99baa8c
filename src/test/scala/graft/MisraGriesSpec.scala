package graft

import org.apache.spark.sql.functions._
import graft.functions.MisraGries

/** Misra-Gries frequent-items sketch: the superset guarantee under
  * arbitrary partitioning (the property the exact heavy-hitters operator
  * rests on), capacity bounding, and the 2-pass recount's equality with
  * the naive GROUP BY.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed synthetic stream: items "h0".."h4" heavy (600..200 copies),
    * a 2000-item uniform tail of singletons-to-triples. N ≈ 2000+.
    */
  private def skewed: Seq[String] =
    (0 until 5).flatMap(i => Seq.fill(600 - 100 * i)(s"h$i")) ++
      (0 until 2000).map(i => s"t${i % 700}")

  test("candidates ⊇ every item above N/(cap+1), any partitioning, ≤ cap entries") {
    val vals = skewed
    val n = vals.size
    for (cap <- Seq(8, 32); parts <- Seq(1, 7, 32)) {
      val truth = vals.groupBy(identity).view.mapValues(_.size)
        .filter { case (_, c) => c.toLong * (cap + 1) > n }.keySet
      val got = vals.toDF("v").repartition(parts)
        .agg(MisraGries.candidates(col("v"), cap).as("c"))
        .collect()(0).getSeq[String](0).toSet
      assert(got.size <= cap, s"cap=$cap parts=$parts overflowed: ${got.size}")
      assert(truth.subsetOf(got),
        s"cap=$cap parts=$parts lost heavy hitters: ${truth -- got}")
    }
  }

  test("adversarial: vocabulary ≫ cap, all-distinct stream stays bounded") {
    val vals = (0 until 5000).map(i => s"u$i")
    val got = vals.toDF("v").repartition(16)
      .agg(MisraGries.candidates(col("v"), 16).as("c"))
      .collect()(0).getSeq[String](0)
    assert(got.size <= 16)
  }

  test("sketch+recount == naive GROUP BY heavy hitters (per group)") {
    val cap = 8
    val rows = skewed.zipWithIndex.map { case (v, i) => (s"g${i % 3}", v) }
    val df = rows.toDF("g", "v").repartition(11)
    val naive = df.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
      .join(df.groupBy("g").agg(count(lit(1)).as("total")), "g")
      .filter(col("cnt") * (cap + 1) > col("total"))
      .select("g", "v", "cnt").as[(String, String, Long)].collect().toSet
    val pass1 = df.groupBy("g").agg(
      MisraGries.candidates(col("v"), cap).as("cands"),
      count(lit(1)).as("total"))
    val cands = pass1.select(col("g"), col("total"), explode(col("cands")).as("v"))
    val got = df.join(broadcast(cands), Seq("g", "v"))
      .groupBy("g", "v").agg(count(lit(1)).as("cnt"), first("total").as("total"))
      .filter(col("cnt") * (cap + 1) > col("total"))
      .select("g", "v", "cnt").as[(String, String, Long)].collect().toSet
    assert(got === naive)
  }

  test("reduce path alone (single partition, tiny cap) honors the guarantee") {
    // forces the decrement-all branch repeatedly: cap 2, three distinct
    // items, one majority item
    val vals = Seq.fill(60)("maj") ++ (0 until 50).map(i => s"x${i % 25}")
    val got = vals.toDF("v").coalesce(1)
      .agg(MisraGries.candidates(col("v"), 2).as("c"))
      .collect()(0).getSeq[String](0).toSet
    assert(got.contains("maj")) // 60 > 110/3
  }
}
