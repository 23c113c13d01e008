package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact deduplication by content hash.
  *
  * groupBy(hash) with min_by keeps ONE deterministic survivor per
  * identical (normalized) content — the hash aggregate gets map-side
  * partial aggregation, so the shuffle carries ≈ |distinct contents|
  * rows regardless of duplication factor. That beats
  * `dropDuplicates(text)` at 100 TB on two counts: the shuffle key is
  * a 32-byte digest instead of the full document, and the survivor
  * choice (min id) is deterministic rather than partition-ordering
  * luck.
  */
object ExactDedup {

  /** Content groups: fingerprint → first (min-id) doc + multiplicity. */
  def groups(df: DataFrame, idCol: String, textCol: Column): DataFrame =
    df.select(col(idCol),
        graft.functions.TextFunctions.fingerprint(
          graft.functions.TextFunctions.normalize(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** The deduplicated survivors (all original columns retained). */
  def dropExact(df: DataFrame, idCol: String, textCol: Column): DataFrame =
    df.join(
      groups(df, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")
}
