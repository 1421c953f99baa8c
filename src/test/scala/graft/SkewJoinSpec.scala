package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

/** Hot-key salted join: result-invariant vs the plain join, hot key
  * spread across sub-keys.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInner == plain inner join on a skewed key distribution") {
    // key 1 is hot (90 of 100 rows)
    val facts = ((1 to 90).map(i => (1L, i.toLong)) ++
      (1 to 10).map(i => (i.toLong + 1, i.toLong))).toDF("k", "v")
    val dim = (1L to 11L).map(k => (k, s"name_$k")).toDF("k", "name")

    val plain = facts.join(dim, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedInner(facts, dim, "k", saltBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.toSeq === plain.toSeq)
    assert(salted.length === 100)

    // the hot key's rows really fan out over several salt buckets
    val salt = pmod(monotonically_increasing_id(), lit(4L))
    val buckets = facts.filter(col("k") === 1L).select(salt.as("s"))
      .distinct().count()
    assert(buckets > 1)
  }

  test("full-row duplicates of a hot key still spread across buckets") {
    // 80 IDENTICAL rows — a content-derived salt would put them all in one
    // bucket and silently defeat the mitigation; the ordinal salt must not
    val facts = Seq.fill(80)((1L, 7L)).toDF("k", "v")
    val dim = Seq((1L, "one")).toDF("k", "name")
    val salted = SkewJoin.saltedInner(facts, dim, "k", saltBuckets = 4)
    assert(salted.count() === 80)
    val buckets = facts
      .withColumn("s", pmod(monotonically_increasing_id(), lit(4L)))
      .select("s").distinct().count()
    assert(buckets === 4)
  }
}
