package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance through ADDITIVE partial state —
  * the materialized-view pattern a tick-by-tick pipeline needs: keep
  * fine-grain (e.g. per-day) partial aggregates as the stored state,
  * and derive every coarser rollup (month, quarter, total) from the
  * partials alone — the raw facts are never rescanned. A new tick
  * recomputes ONLY its own day's partial (the incremental-scan window,
  * S2) and overwrites that one key; at 100 TB the daily maintenance
  * cost is the day's slice, not the corpus.
  *
  * Only DECOMPOSABLE aggregates ride this path: count/sum re-merge by
  * summing, min/max by min/max, avg as sum/count at read time.
  * count(DISTINCT x) does NOT (distinct sets don't add) — that is
  * what sketches (HLL) or the exact one-shot aggregate are for, and
  * why this operator exposes no distinct column.
  */
object AdditiveRollup {

  /** Fine-grain partial state: one row per (grainCol, keys) carrying
    * the additive components (n, sum, min, max) of `valueCol`.
    */
  def partials(df: DataFrame, grain: Column, keys: Seq[String],
      valueCol: Column): DataFrame =
    df.groupBy((grain.as("_grain") +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"),
        sum(valueCol).as("sum_v"),
        min(valueCol).as("min_v"),
        max(valueCol).as("max_v"))

  /** Re-aggregate stored partials to a coarser grain. `coarse` maps
    * the stored `_grain` column to the coarser bucket (e.g. day →
    * month). Emits the same additive components plus the read-time
    * average.
    */
  def rollup(partialsDf: DataFrame, coarse: Column, keys: Seq[String]): DataFrame =
    partialsDf
      .groupBy((coarse.as("grain") +: keys.map(col)): _*)
      .agg(sum("n").as("n"),
        sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"),
        max("max_v").as("max_v"))
      .withColumn("avg_v", col("sum_v") / col("n"))
}
