package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashing.
  *
  * Dedup operators (MinHash, SimHash, fingerprinting) need a hash the DuckDB
  * oracle can reproduce bit-for-bit. Spark's `hash()`/`xxhash64` and DuckDB's
  * `hash()` are different algorithms, so we standardize on md5 (identical
  * everywhere) and take the first 15 hex chars as a 60-bit non-negative Long:
  * Spark `conv(substring(md5(x),1,15),16,10)` ==
  * DuckDB `('0x' || substring(md5(x),1,15))::BIGINT`.
  *
  * md5 is not codegen'd arithmetic like xxhash64, but dedup hashing is
  * O(tokens) per document and amortizes over the scan; at 100 TB the cost
  * center is the shuffle, not the hash.
  */
object Hashing {

  /** 60-bit unsigned hash of a string column (stable across engines). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant for MinHash permutations: hash of `value # seed`. */
  def md5LongSeeded(c: Column, seed: Int): Column =
    md5Long(concat(c, lit("#"), lit(seed.toString)))

  /** DuckDB SQL fragment mirroring [[md5Long]] (oracle-side). */
  def sqlMd5Long(expr: String): String =
    s"('0x' || substring(md5($expr),1,15))::BIGINT"

  /** DuckDB SQL fragment mirroring [[md5LongSeeded]]. */
  def sqlMd5LongSeeded(expr: String, seed: Int): String =
    sqlMd5Long(s"$expr || '#' || '$seed'")

  // -- MinHash permutation family: ONE md5 per value, then k affine
  // universal hashes h_s(x) = (a_s * (x mod p) + b_s) mod p with p = 2^31-1.
  // a_s*(x mod p) < 2^62 stays inside int64, so the arithmetic is exact (and
  // identical) in any engine; 16x cheaper than 16 seeded md5 digests.

  val MinhashP: Long = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** Knuth multiplicative constants, reduced mod p; a_s != 0. */
  def minhashA(s: Int): Long = ((s + 1).toLong * 0x9E3779B1L) % MinhashP
  def minhashB(s: Int): Long = ((s + 1).toLong * 0x85EBCA77L) % MinhashP

  /** s-th minhash permutation of a string column. */
  def minhashPerm(c: Column, s: Int): Column =
    (lit(minhashA(s)) * (md5Long(c) % lit(MinhashP)) + lit(minhashB(s))) % lit(MinhashP)

  /** DuckDB SQL fragment mirroring [[minhashPerm]]. */
  def sqlMinhashPerm(expr: String, s: Int): String =
    s"((${minhashA(s)} * (${sqlMd5Long(expr)} % $MinhashP) + ${minhashB(s)}) % $MinhashP)"
}
