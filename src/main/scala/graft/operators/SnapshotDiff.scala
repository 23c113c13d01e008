package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between two keyed snapshots: which keys were
  * inserted, deleted, or updated, with both sides' payloads.
  *
  * The reference ships whole windows and lets the stores converge
  * (LWW + 409-delete); a warehouse consumer usually wants the DELTA
  * between two published snapshots instead — the feed a downstream
  * incremental materialization or audit consumes. This is the
  * declarative diff: one full-outer join on the key columns, change
  * class decided by null-side and column-wise IS DISTINCT FROM over
  * the compared payload (null-safe, so NULL→value and value→NULL are
  * updates, NULL→NULL is not).
  *
  * Scale: one shuffle of each snapshot on the key (or zero if both
  * snapshots are bucketed/partitioned by key — the layout TableIO's
  * day-partitioning points at); the comparison is a codegen'd
  * projection. Unchanged keys are dropped before anything downstream,
  * so output is proportional to churn, not corpus.
  */
object SnapshotDiff {

  /** @param compareCols payload columns that define "changed";
    *                     defaults to all non-key columns present in
    *                     BOTH snapshots.
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCols: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else oldSnap.columns.filterNot(idCols.contains)
        .filter(newSnap.columns.contains).toSeq
    val o = oldSnap.select((idCols ++ cmp).map(col): _*)
      .withColumnsRenamed(cmp.map(c => c -> s"old_$c").toMap)
    val n = newSnap.select((idCols ++ cmp).map(col): _*)
      .withColumnsRenamed(cmp.map(c => c -> s"new_$c").toMap)
    // join-key presence flags survive the outer join's null padding
    val j = o.withColumn("__in_old", lit(true))
      .join(n.withColumn("__in_new", lit(true)), idCols, "full_outer")
    val changed = cmp
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    j.withColumn("change_type",
        when(col("__in_old").isNull, "insert")
          .when(col("__in_new").isNull, "delete")
          .when(changed, "update"))
      .filter(col("change_type").isNotNull)
      .drop("__in_old", "__in_new")
  }
}
