package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sketch.CountMin
import graft.sources.ParquetTableIO

/** Continuously-maintained Count-Min sketch: every micro-batch builds
  * the sketch of ITS OWN items (one explode + aggregate over the
  * batch, never the history) and merges it into the persisted sketch
  * through the versioned-pointer commit — approximate corpus
  * frequencies that stay current without ever rescanning the corpus.
  * The stored state is bounded at depth × width rows FOREVER, no
  * matter how much data streams through: this is the sketch's whole
  * point, and what makes it the streaming-safe alternative to an
  * unbounded exact groupBy state.
  *
  * Replay caveat (documented, not hidden): CMS merge is additive, so
  * a crash between the sketch commit and the checkpoint advancing
  * can double-count one batch on retry — the classic
  * at-least-once-sink limitation. Estimates stay upper bounds (the
  * CMS contract survives; counts inflate by at most one batch), and
  * a deployment needing exactness records the last merged batchId
  * next to the sketch and skips already-merged batches — the same
  * pointer the commit already writes versioned state through.
  */
object StreamingSketch {

  /** Start maintaining `sketchIO` over a streaming frame's `itemCol`. */
  def start(spark: SparkSession, items: DataFrame, itemCol: String,
      sketchIO: ParquetTableIO, depth: Int, width: Int,
      checkpoint: String, trigger: Trigger): StreamingQuery =
    items.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val delta = CountMin.build(batch, col(itemCol), depth, width)
          val merged =
            if (sketchIO.exists)
              CountMin.merge(Seq(sketchIO.read(batch.sparkSession), delta))
            else delta
          sketchIO.overwrite(merged)
        }
        ()
      }
      .start()
}
