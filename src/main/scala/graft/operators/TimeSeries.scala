package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * grid and forward-fill the gaps — the step that turns irregular
  * event data (the reference's `(id, version)` update stream) into
  * the aligned series a feature pipeline or monitor consumes.
  *
  * Pipeline per key: bucket events to the grid (one hash aggregate),
  * derive each key's [first, last] grid span, explode the span into
  * grid ticks (`sequence` — rows generated executor-side, nothing on
  * the driver), left-join observations back, then one ordered window
  * pass carries the last observation forward (`last(_, ignoreNulls)`
  * over rows between unbounded preceding and current).
  *
  * Scale: everything is keyed by the series key — the aggregate, the
  * join, and the fill window all share one hash partitioning, which
  * AQE/exchange-reuse collapses to a single shuffle; the explode
  * multiplies rows but never crosses partitions. Dense-grid blowup is
  * the caller's knob (`stepMs`), as with every pair-producing operator
  * in this engine: output is sized by span/step, not input rows.
  */
object TimeSeries {

  /** @param df      events with `keyCol`, epoch-millis `tsMsCol`, and
    *                a numeric `valueCol` to aggregate per tick
    * @param stepMs  grid step (e.g. 60000 = minute bars)
    * @return one row per (key, grid tick) over each key's observed
    *         span: observed sum (`v_obs`, null on gap ticks), the
    *         forward-filled value (`v_ffill`), and `is_gap`
    */
  def gapFillFfill(
      df: DataFrame,
      keyCol: String,
      tsMsCol: String,
      valueCol: String,
      stepMs: Long): DataFrame = {
    require(stepMs > 0, "stepMs must be positive")
    // floor, not cast-truncation: truncation rounds toward zero, so
    // pre-1970 (negative) timestamps would share bucket 0 with early
    // positive ones and diverge from floor-division semantics
    val tick = floor(col(tsMsCol) / stepMs).cast("long") * stepMs
    val obs = df
      .groupBy(col(keyCol), tick.as("tick_ms"))
      .agg(sum(col(valueCol)).as("v_obs"))
    val grid = obs
      .groupBy(col(keyCol))
      .agg(min("tick_ms").as("t0"), max("tick_ms").as("t1"))
      .select(col(keyCol),
        explode(sequence(col("t0"), col("t1"), lit(stepMs))).as("tick_ms"))
    val w = Window.partitionBy(keyCol).orderBy("tick_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "tick_ms"), "left")
      .withColumn("v_ffill", last("v_obs", ignoreNulls = true).over(w))
      .withColumn("is_gap", col("v_obs").isNull)
  }
}
