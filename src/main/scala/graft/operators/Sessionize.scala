package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of a key belong to one
  * session while the gap between them stays <= `gapMs`; a larger gap
  * starts a new session.
  *
  * Shape: one shuffle on the key, one ordered window pass — the
  * boundary flag is `lag`, the session id its running sum. No
  * state store, no iteration; at 100 TB the cost is the same as any
  * per-key window (sort within partitions after one exchange).
  * `orderCols` breaks timestamp ties deterministically (required for
  * reproducible session ids under replays).
  *
  * The streaming analogue is `session_window` with a watermark; this
  * batch form is what backfills and oracle checks use.
  */
object Sessionize {

  /** Adds `session_id` (1-based, per key, in time order). */
  def assign(df: DataFrame, keys: Seq[String], tsCol: String,
      gapMs: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = col(tsCol) +: tieBreak.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(
      prev.isNull || col(tsCol) - prev > gapMs, lit(1)).otherwise(lit(0))
    df.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session summary: bounds, event count, duration. */
  def summarize(df: DataFrame, keys: Seq[String], tsCol: String,
      gapMs: Long, tieBreak: Seq[String] = Nil): DataFrame =
    assign(df, keys, tsCol, gapMs, tieBreak)
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration_ms"))
}
