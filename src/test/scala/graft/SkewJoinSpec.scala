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
    val salt = pmod(hash(facts.columns.map(col): _*), lit(4))
    val buckets = facts.filter(col("k") === 1L).select(salt.as("s"))
      .distinct().count()
    assert(buckets > 1)
  }
}
