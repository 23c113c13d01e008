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
  * Replay safety: CMS merge is additive, so a bare merge-and-commit
  * would double-count a batch replayed after a crash between the
  * sketch commit and the checkpoint advancing (the classic
  * at-least-once-sink trap). The sink therefore records the LAST
  * MERGED batchId as a column of the stored sketch itself — it rides
  * inside the same versioned snapshot, so sketch and marker commit in
  * ONE atomic pointer swap — and skips any batch at or below it.
  * foreachBatch replays reuse the original batchId, which makes the
  * skip exact: the sink is effectively exactly-once.
  *
  * The marker also records WHICH checkpoint it belongs to: batch ids
  * restart at 0 under a fresh checkpoint, so a bare id comparison
  * would silently drop a new run's first batches as "replays" when a
  * user points a fresh stream at an existing sketch store. The skip
  * therefore fires only when the stored checkpoint id matches the
  * running query's — a foreign or legacy marker is ignored and the
  * batches merge normally.
  */
object StreamingSketch {

  /** Marker column persisted with the sketch (same value every row —
    * depth × width rows bound the cost). Strip it before handing the
    * stored frame to `CountMin.merge`; `estimate` ignores extra
    * columns.
    */
  val LastBatchCol = "_last_batch"

  /** Checkpoint-identity column persisted beside [[LastBatchCol]]:
    * the replay skip only applies to markers written under the SAME
    * checkpoint location.
    */
  val CkptCol = "_ckpt"

  /** Start maintaining `sketchIO` over a streaming frame's `itemCol`. */
  def start(spark: SparkSession, items: DataFrame, itemCol: String,
      sketchIO: ParquetTableIO, depth: Int, width: Int,
      checkpoint: String, trigger: Trigger): StreamingQuery =
    items.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val prior =
            if (sketchIO.exists) Some(sketchIO.read(batch.sparkSession))
            else None
          val lastMerged = prior
            .filter(p => p.columns.contains(LastBatchCol) &&
              p.columns.contains(CkptCol))
            .flatMap(p => Option(p.filter(col(CkptCol) === checkpoint)
                .agg(max(col(LastBatchCol))).head.get(0))
              .map(_.asInstanceOf[Long]))
          if (!lastMerged.exists(_ >= batchId)) {
            val delta = CountMin.build(batch, col(itemCol), depth, width)
            val merged = prior
              .map(p => CountMin.merge(Seq(p.drop(LastBatchCol, CkptCol), delta)))
              .getOrElse(delta)
            sketchIO.overwrite(merged
              .withColumn(LastBatchCol, lit(batchId))
              .withColumn(CkptCol, lit(checkpoint)))
          }
        }
        ()
      }
      .start()
}
