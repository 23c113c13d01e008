package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.core.SyncSpec
import graft.operators.LwwMerge
import graft.sources.TableIO

/** Structured-Streaming periodic sync — the engine-native upgrade of
  * the reference's sleep-loop daemon (SyncCassElastic.py:45-47,
  * SURVEY.md §2.9 T1-T5):
  *
  *  - the drift-corrected sleep becomes `Trigger.ProcessingTime`
  *    (or `AvailableNow` for catch-up runs);
  *  - the lastruntime.log watermark becomes the engine's atomic
  *    `checkpointLocation` offset log — files are processed exactly
  *    once across restarts with no hand-rolled state;
  *  - each micro-batch LWW-merges into the destination snapshot via
  *    foreachBatch; because the merge is idempotent (same version ⇒
  *    incumbent kept), a replayed batch after a crash converges to
  *    the same snapshot — at-least-once delivery + idempotent apply =
  *    effectively-once, the same guarantee the reference gets from ES
  *    external versioning (T5) but engine-side;
  *  - late data: the reference silently LOSES rows older than its
  *    window (T4). Here there is no window to miss — every file is
  *    an offset, and LWW decides by version, however late the row.
  */
object StreamSync {

  /** Start a one-direction incremental sync: parquet files landing in
    * `incomingDir` stream into `dest` under LWW merge. `schema` is
    * required by file streaming sources (no inference mid-stream).
    */
  def start(
      spark: SparkSession,
      incomingDir: String,
      schema: StructType,
      dest: TableIO,
      spec: SyncSpec,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val incoming = spark.readStream.schema(schema).parquet(incomingDir)
    incoming.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val deduped = LwwMerge.latestAgg(batch, Seq(spec.idCol), spec.versionCol)
        val merged =
          if (dest.exists)
            LwwMerge.merge(dest.read(batch.sparkSession), deduped,
              Seq(spec.idCol), spec.versionCol)
          else deduped
        dest.overwrite(merged)
      }
      .start()
  }
}
