package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the LATEST right row whose
  * timestamp is <= the left row's, within the same key group — the
  * event-attribution / point-in-time-lookup operator Spark has no
  * built-in for.
  *
  * Shape: a naive formulation is a range θ-join
  * (`l.key = r.key AND r.ts <= l.ts` + a per-left max) whose physical
  * plan is a per-key cross product — quadratic in events-per-key and
  * hopeless at 100 TB. This operator instead UNIONS the two sides
  * (right rows flagged 0, left rows 1), sorts each key group once by
  * `(ts, side)`, and carries the last-seen right payload forward with
  * a running `last(_, ignoreNulls)` window. One shuffle on the key,
  * one sort, linear in group size; `side` ordering makes an
  * equal-timestamp right row visible to the left row (ties match,
  * i.e. `<=` not `<`).
  *
  * Contract: right must be unique per (keys, ts) — pre-dedup with the
  * engine's LWW merge if it isn't (deterministic results require a
  * deterministic choice among equal timestamps). Right's non-key,
  * non-ts columns become the output payload (null when no match —
  * left-join semantics); their names must not collide with left's.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val leftCols = left.columns

    val lpType = left.select(struct(leftCols.map(col): _*).as("_lp"))
      .schema("_lp").dataType
    val rpType = right.select(struct(payload.map(col): _*).as("_rp"))
      .schema("_rp").dataType

    val l = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("_ts"), lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_lp"),
        lit(null).cast(rpType).as("_rp")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("_ts"), lit(0).as("_side"),
        lit(null).cast(lpType).as("_lp"),
        struct(payload.map(col): _*).as("_rp")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_m", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col("_lp").getField(c).as(c)) ++
        payload.map(c => col("_m").getField(c).as(c)): _*)
  }

  /** Same semantics through the custom whole-operator Catalyst path:
    * [[graft.plans.AsOfJoinPlan]] → `AsOfJoinStrategy` →
    * sort-merge [[graft.plans.AsOfJoinExec]]. Each side shuffles its
    * OWN columns once and the partitions merge in a single linear pass
    * — no null-padded union doubling row width, no window function;
    * see AsOfJoinExec's doc for the scale argument. Filters on left
    * columns still reach the scan via `PushFilterThroughAsOfJoin`.
    */
  def asOfNative(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String): DataFrame = {
    val spark = left.sparkSession
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    // Shared lineage (both sides off one DataFrame) would leave the two
    // children sharing expression IDs; the analyzer's
    // DeduplicateRelations can't see through a custom node, so re-alias
    // the right side to fresh IDs ourselves.
    val rp =
      if (lp.outputSet.intersect(rp0.outputSet).isEmpty) rp0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rp0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rp0)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    org.apache.spark.sql.graft.GraftBridge.ofRows(spark,
      graft.plans.AsOfJoinPlan(lp, rp,
        keys.map(attr(lp, _)), keys.map(attr(rp, _)),
        attr(lp, tsCol), attr(rp, tsCol)))
  }
}
