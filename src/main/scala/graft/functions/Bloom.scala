package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter semi-join reduction (an explicit, oracle-able
  * runtime filter — the same shape AQE's `runtime.bloomFilter` injects, but
  * built from the cross-engine md5 hash family so results and plans are
  * reproducible).
  *
  * Usage shape: build the bitmap from the (already filtered) dim side with
  * ONE tiny aggregation, then prefilter the fact scan with a pure-codegen
  * membership test BEFORE the join. The join that follows is exact, so the
  * bloom's false positives are semantically invisible — the filter only
  * reduces how many fact rows reach the join/shuffle. At 100 TB this is the
  * difference between shuffling every fact row and shuffling only candidate
  * rows: the bitmap is mBits/8 bytes (8 KiB at 2^16) riding a broadcast
  * literal, while the dim-side build aggregates k positions per dim row into
  * at most mBits/64 words.
  *
  * The driver-side `build().collect()` is config-scale state (mBits/64
  * longs, like the compiled CIDR hierarchy in [[graft.ops.Lookups]]), not a
  * data collect: its size is fixed by the filter parameters, independent of
  * table cardinality.
  *
  * k seed-prefixed xxhash64 probes (k=4, mBits=2^16 → fpp ≈
  * (1-e^(-kn/m))^k ≈ 4e-6 at n=750). The family MUST be cheap: the test
  * runs once per FACT row ahead of the join, and an earlier md5-seeded
  * variant (digest → hex → substring → base-16 conv per seed, evaluated
  * twice per probe) measured 3.3 s over a 0.13 s lineitem scan at sf0.1 —
  * the "optimization" cost 10× the plain broadcast semi join it was meant
  * to beat. xxhash64 is a codegen'd native expression (~ns/row); the
  * filter's false positives are semantically invisible (the exact join
  * follows), so no oracle models the family and it can be engine-native.
  */
object Bloom {

  /** k bit positions of a key (seed-prefixed xxhash64; pmod → [0, mBits)). */
  def positions(c: Column, k: Int, mBits: Int): Seq[Column] =
    (0 until k).map(s => pmod(xxhash64(lit(s), c), lit(mBits.toLong)))

  /** Bitmap words as a DataFrame: one explode + one 64-ary groupBy (map-side
    * partial `bit_or`). At most mBits/64 output rows.
    */
  def buildWords(dim: DataFrame, key: Column, k: Int, mBits: Int): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits $mBits must be a positive multiple of 64")
    dim.select(explode(array(positions(key, k, mBits).map(_.as("p")): _*)).as("pos"))
      .groupBy((col("pos") / 64).cast("int").as("word_idx"))
      .agg(expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))").as("word"))
  }

  /** Dense bitmap (mBits/64 longs) — config-scale driver state. */
  def build(dim: DataFrame, key: Column, k: Int, mBits: Int): Array[Long] = {
    val words = new Array[Long](mBits / 64)
    buildWords(dim, key, k, mBits).collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Membership test as a pure expression over the literal bitmap — stays
    * inside whole-stage codegen on the fact scan, upstream of any join.
    */
  def mightContain(c: Column, bitmap: Array[Long], k: Int, mBits: Int): Column = {
    require(bitmap.length == mBits / 64, s"bitmap has ${bitmap.length} words, want ${mBits / 64}")
    val bm = typedLit(bitmap.toSeq)
    positions(c, k, mBits).map { p =>
      val word = element_at(bm, (p / 64).cast("int") + 1)
      call_function("getbit", word, (p % 64).cast("int")) === 1
    }.reduce(_ && _)
  }
}
