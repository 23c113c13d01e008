package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shingle extraction — the shared substrate of MinHash, n-gram
  * Jaccard, and fingerprinting. Pure Catalyst higher-order functions;
  * the shingle array never leaves the executor that computed it.
  */
object Shingles {

  /** Overlapping character n-grams of a normalized text column.
    * Texts shorter than `n` yield one (short) shingle so no document
    * ever has an empty set (which would poison Jaccard's union).
    */
  def charShingles(norm: Column, n: Int = 5): Column =
    transform(
      sequence(lit(1), greatest(length(norm) - (n - 1), lit(1))),
      i => substring(norm, i, lit(n)))

  /** Distinct char shingles — the SET form Jaccard needs. */
  def charShingleSet(norm: Column, n: Int = 5): Column =
    array_distinct(charShingles(norm, n))

  /** Exact Jaccard similarity of two shingle-set columns, 4 decimals.
    * Intersection cardinality via hash-based `array_intersect` —
    * O(|a|+|b|) per pair where filter+contains is O(|a|·|b|); on
    * DISTINCT inputs (which shingle SETS are) the cardinality is
    * identical to the oracle's list_filter/contains formulation.
    * Union by inclusion-exclusion.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    round(inter.cast("double") / (size(a) + size(b) - inter), 4)
  }
}
