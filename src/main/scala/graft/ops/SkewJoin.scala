package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join (the 100 TB hot-key pattern): the skewed side
  * gets a deterministic content-derived salt in [0, saltBuckets), the
  * other side is replicated once per bucket, and the join key becomes
  * (key, salt) — so one hot key's rows spread over `saltBuckets` reducers
  * instead of hammering one. Results are exactly a plain equi-join's
  * (every (key, salt) pair meets its replica).
  *
  * When to reach for it: AQE's skew-join split already handles plain
  * shuffle-join skew at runtime; explicit salting matters when skew
  * reappears downstream of the join (e.g. the join feeds an aggregation
  * on the same key), when the join is inside a stage AQE cannot re-plan,
  * or on engines without runtime re-optimization. Broadcast remains
  * strictly better whenever the small side fits in executor memory.
  * Replication factor is `saltBuckets` on the small side only.
  */
object SkewJoin {

  /** Inner equi-join of `skewed` with `other` on `key`, salted with
    * `saltBuckets` sub-keys. Column set of the result = plain join's
    * (the salt column is internal).
    */
  def saltedInner(skewed: DataFrame, other: DataFrame, key: String,
                  saltBuckets: Int = 8): DataFrame = {
    // Salt from a per-row ordinal, NOT a content hash: full-row duplicates
    // of a hot key (common in log workloads) would all hash to the same
    // bucket and silently defeat the mitigation, and hash() errors on
    // MapType columns. monotonically_increasing_id is consecutive within a
    // partition, so pmod spreads a hot key's rows uniformly across buckets.
    // The salt value never affects the RESULT (every bucket meets a full
    // replica of the other side) — only the distribution, so the id's
    // run-to-run nondeterminism is harmless.
    val b = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
    val r = other.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    b.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
