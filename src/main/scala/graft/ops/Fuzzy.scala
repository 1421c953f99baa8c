package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-bounded fuzzy join via deletion-neighborhood signatures —
  * the SymSpell blocking scheme (Garbe's symmetric-delete algorithm,
  * public domain spelling-correction literature) turned into a
  * distributed equi-join.
  *
  * For max distance 1: sig(t) = {t} ∪ {t with one character deleted}.
  * Any two strings within Levenshtein distance 1 share at least one
  * signature (substitution at i → both drop position i; insertion →
  * the shorter string IS a deletion of the longer; equality → t itself),
  * so the candidate set from an equi-join on signatures is a guaranteed
  * superset of the true pair set, and the exact `levenshtein` filter on
  * candidates makes the result exact. This converts the quadratic
  * all-pairs edit-distance join into: explode ×(len+1) on each side,
  * one hash join on the signature key, exact verify on candidates only —
  * the same bucket-then-verify shape as the MinHash/LSH family, with the
  * signature in the role of the band key. At 100 TB the signature join
  * shuffles O(rows × avg_len) keys, never rows²; a dictionary-sided join
  * (spell-check against a bounded vocabulary) broadcasts the dictionary
  * side and skips the shuffle entirely.
  */
object Fuzzy {

  /** Deletion-neighborhood signatures of a string column: the string
    * itself plus each single-character deletion (empty-safe: a length-0
    * string contributes only itself — `sequence(1, 0)` would REVERSE and
    * fabricate signatures).
    */
  def deletionSigs(t: Column): Column = {
    val dels = transform(sequence(lit(1), length(t)), i =>
      concat(t.substr(lit(1), i - lit(1)), t.substr(i + lit(1), length(t) - i)))
    when(length(t) >= 1, array_union(array(t), dels)).otherwise(array(t))
  }

  /** DuckDB SQL fragment mirroring one [[deletionSigs]] element: with
    * `g(i)` from `generate_series(0, len)`, i = 0 is the identity
    * signature and i ≥ 1 deletes position i.
    */
  def sqlDeletionSig(expr: String): String =
    s"CASE WHEN g.i = 0 THEN $expr ELSE substring($expr, 1, g.i - 1) || substring($expr, g.i + 1) END"

  /** Candidate pairs of `left` × `right` within Levenshtein distance
    * `maxDist` (currently 1): signature-join then exact verify. Both
    * inputs must expose the named string column; output keeps all left
    * and right columns (signature column dropped), distinct over the
    * joined rows (a pair can share several signatures).
    */
  def joinWithin1(left: DataFrame, leftCol: String,
                  right: DataFrame, rightCol: String): DataFrame = {
    val l = left.withColumn("__sig", explode(deletionSigs(col(leftCol))))
    val r = right.withColumn("__sig", explode(deletionSigs(col(rightCol))))
    l.join(r, "__sig")
      .filter(levenshtein(col(leftCol), col(rightCol)) <= 1)
      .drop("__sig")
      .distinct()
  }
}
