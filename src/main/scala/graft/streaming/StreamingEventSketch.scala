package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sketch.HyperLogLog
import graft.sources.ParquetTableIO

/** Streaming maintenance of per-day HLL activity registers — the
  * stream form of `sketch.EventSketchStore`: every micro-batch builds
  * the (day, register, r) rows of ITS OWN events and max-folds them
  * into the persisted register table through the versioned-pointer
  * commit. The stored state is bounded at days × 2^p rows no matter
  * how many events stream through, any sliding distinct-actives
  * window is answered from the store (q52's shape), and a LATE event
  * folds into its own old day's registers — out-of-order streams need
  * no watermark and lose nothing.
  *
  * Replay safety WITHOUT a marker: unlike `StreamingSketch`'s
  * additive Count-Min (where a replayed batch double-counts and the
  * last-merged-batch marker must skip it), the HLL register merge is
  * `max` — IDEMPOTENT — so re-merging a replayed batch is a no-op by
  * algebra, not by bookkeeping. At-least-once delivery composes with
  * a max-fold into exactly-once semantics for free; the sink
  * deliberately carries no marker machinery to keep that property
  * load-bearing and spec-visible.
  *
  * Reference behavior generalized: the reference's per-run counter
  * reports (`pyCassElastic.py:356-383`) as continuously-maintained,
  * time-sliced, mergeable state.
  */
object StreamingEventSketch {

  /** Per-day HLL of distinct `userCol` actives (day = epoch-millis of
    * `tsCol` div 86400000 — the [[graft.sketch.EventSketchStore]]
    * attribution, so batch and stream stores are interchangeable).
    */
  private def dayHll(batch: DataFrame, userCol: String,
      tsCol: String): DataFrame =
    HyperLogLog.build(
      batch.select(expr(s"unix_millis($tsCol) div 86400000").as("day"),
        col(userCol).cast("string").as("item")).distinct(),
      col("item"), keys = Seq("day"))

  /** Start maintaining `registersIO` over a streaming event frame. */
  def start(spark: SparkSession, events: DataFrame, userCol: String,
      tsCol: String, registersIO: ParquetTableIO, checkpoint: String,
      trigger: Trigger): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val delta = dayHll(batch, userCol, tsCol)
          val merged =
            if (registersIO.exists)
              registersIO.read(batch.sparkSession).unionByName(delta)
                .groupBy("day", "register").agg(max("r").as("r"))
            else delta
          registersIO.overwrite(merged)
        }
        ()
      }
      .start()
}
