package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time tumbling-window aggregation with a watermark — the
  * principled replacement for the reference's late-data behavior
  * (SURVEY.md §2.9 T3/T4).
  *
  * The reference's single `(last, this]` window silently LOSES any row
  * whose version lands at-or-before the persisted watermark — the
  * window never revisits (reference pyCassElastic.py:156-163; gap
  * acknowledged in SURVEY §2.9 T4). Here lateness is a first-class,
  * configurable contract: rows later than `lateness` behind the
  * engine-maintained event-time watermark are dropped by the ENGINE
  * with bounded state, everything newer is aggregated exactly, and in
  * append mode a window only emits once it can no longer change.
  * State size is O(open windows × dims), independent of stream length.
  *
  * Works identically on a batch DataFrame (window() is the same
  * expression), which is how the spec cross-checks streaming output
  * against a batch ground truth.
  */
object WindowedStats {

  /** Event-time SESSION windows per `dims`: a session extends while
    * consecutive events arrive within `gap` of the last one, and closes
    * `gap` after the final event (end-exclusive — an event landing
    * exactly at `last + gap` opens a NEW session). Spark's native
    * `session_window` keeps one mergeable state entry per OPEN session
    * and key; in streaming it requires the watermark (sessions finalize
    * once the watermark passes their end), in batch it evaluates the
    * same expression with no state at all.
    *
    * This is the streaming-native counterpart of the batch
    * `operators.Sessionize` (lag-boundary + running-sum ids): same
    * islands, but mergeable-state instead of a two-window pass — the
    * form that survives an unbounded stream.
    */
  def sessions(events: DataFrame, tsCol: String, gap: String,
      lateness: String, dims: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap) +: dims.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(Seq(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end")) ++ dims.map(col) :+ col("n"): _*)

  /** Tumbling `width` windows per `dims`, counting rows and summing
    * `valueCol` when provided.
    */
  def tumbling(events: DataFrame, tsCol: String, width: String,
      lateness: String, dims: Seq[String],
      valueCol: Option[String] = None): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n") +:
      valueCol.map(v => sum(col(v)).as("total_value")).toSeq
    val outCols =
      Seq(col("window.start").as("win_start"), col("window.end").as("win_end")) ++
        dims.map(col) ++ Seq(col("n")) ++
        valueCol.map(_ => col("total_value")).toSeq
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width) +: dims.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(outCols: _*)
  }
}
