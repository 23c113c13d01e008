package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-driven incremental view maintenance — the consumer the change
  * feed ([[graft.sources.SnapshotChangeFeed]] / [[SnapshotDiff]])
  * exists to drive: a grouped additive aggregate (count/sum) is kept
  * current by applying each change set as SIGNED contributions —
  * an insert adds its new value, a delete subtracts its old one, an
  * update does both — instead of rescanning the snapshot.
  *
  * Cost of [[apply]]: one aggregation of the CHANGE SET (∝ churn)
  * plus a key-partitioned outer merge against the |groups|-row state.
  * What the whole tick costs depends on where the change set comes
  * from: a producer that KNOWS its delta (an ingest batch, the
  * streaming pipeline, a writer emitting its own change log) makes
  * the full path O(churn + groups); the poll-and-diff feed
  * ([[graft.sources.SnapshotChangeFeed]]) must SCAN both snapshot
  * versions to derive the diff (the store keeps no row-level log),
  * so its tick is O(snapshot) read + O(churn) maintenance — it
  * eliminates the re-AGGREGATION and any downstream recompute, not
  * the read. The delta-propagation discount grows with how much work
  * sits downstream of the aggregate.
  *
  * Only ADDITIVE aggregates ride this path (count/sum; avg at read
  * time as sum/n) — min/max are not retractable without keeping per-
  * group heaps, and count(DISTINCT) needs the d8/c4 machinery; both
  * documented away here exactly as in [[AdditiveRollup]]. Groups
  * whose count reaches zero are dropped from the state (not left as
  * ghost rows), asserted in the spec.
  */
object DeltaRollup {

  /** Initial state from a bootstrap change set (or any insert-only
    * frame): one row per group of (n, sum_v).
    */
  def init(changes: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    apply(emptyState(changes, keys), changes, keys, valueCol)

  private def emptyState(like: DataFrame, keys: Seq[String]): DataFrame =
    like.select(keys.map(col): _*).limit(0)
      .withColumn("n", lit(0L)).withColumn("sum_v", lit(0.0d))

  /** One maintenance step: `state` (keys, n, sum_v) advanced by a
    * [[SnapshotDiff]]-shaped change frame (`change_type`,
    * `old_<valueCol>`, `new_<valueCol>`, plus the group keys).
    *
    * Insert/update rows contribute (+1 where newly present, new
    * value); delete/update rows retract (−1 where leaving, old
    * value). The group keys must be CHANGE-INVARIANT (part of the
    * diff key): a row changing groups surfaces as delete + insert
    * under a diff keyed on the row id with the group carried in the
    * payload — callers diff on the row key and pass the group column
    * of each side explicitly.
    */
  def apply(state: DataFrame, changes: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val newV = col(s"new_$valueCol")
    val oldV = col(s"old_$valueCol")
    val dn = when(col("change_type") === "insert", 1L)
      .when(col("change_type") === "delete", -1L)
      .otherwise(0L)
    val dv = coalesce(when(col("change_type").isin("insert", "update"), newV)
        .otherwise(lit(0.0d)), lit(0.0d)) -
      coalesce(when(col("change_type").isin("delete", "update"), oldV)
        .otherwise(lit(0.0d)), lit(0.0d))
    val delta = changes.groupBy(keys.map(col): _*)
      .agg(sum(dn).as("_dn"), sum(dv).as("_dv"))
    state.join(delta, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n"),
        (coalesce(col("sum_v"), lit(0.0d)) + coalesce(col("_dv"), lit(0.0d)))
          .as("sum_v")): _*)
      .filter(col("n") > 0)
  }
}
