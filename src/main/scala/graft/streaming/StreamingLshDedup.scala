package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.MinHashLSH
import graft.functions.TextFunctions
import graft.sources.ParquetTableIO

/** Streaming near-duplicate detection: every micro-batch of documents
  * is probed against the PERSISTED MinHash band index (d10's
  * incremental discipline wired into Structured Streaming), its
  * candidates appended to a result table, and its own bands merged
  * into the index — so each document's text is shingled exactly once,
  * in the batch that carried it.
  *
  * Replay safety: a micro-batch retried after a crash re-derives the
  * identical (deterministic) bands; the index merge distincts on the
  * full row; candidate pairs are written into a per-batch-id
  * partition with DYNAMIC partition overwrite, so the retry replaces
  * its own partition instead of appending a second copy; and the
  * probe join drops id_index == id_probe (a replayed batch probes an
  * index that already absorbed its own bands). All three surfaces are
  * idempotent under replay — the engine-wide discipline (LwwMerge,
  * SkewTools doc) extended to this pipeline.
  *
  * Scale shape: the index holds b small rows (id, band, bucket) per
  * document and no text. The demo merge rewrites the snapshot via
  * ParquetTableIO (versioned-pointer commit); a production deployment
  * appends band-partitioned files instead — the probe join, the only
  * per-batch O(index) cost, is unchanged and shuffles only the band
  * keys.
  */
object StreamingLshDedup {

  /** Start the pipeline on a streaming documents DataFrame.
    *
    * @param candidatesDir plain parquet dir the (id_index, id_probe)
    *                      candidate pairs are appended to
    */
  def start(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, indexIO: ParquetTableIO, candidatesDir: String,
      checkpoint: String, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val norm = TextFunctions.normalize(col(textCol))
          // signatures computed ONCE per batch, reused for probe + merge
          val bands = MinHashLSH.bandedIndex(batch, idCol, norm)
            .localCheckpoint(true)
          if (indexIO.exists) {
            val index = indexIO.read(batch.sparkSession)
            MinHashLSH.probeCandidatesBanded(index, bands, idCol)
              .withColumn("_batch", org.apache.spark.sql.functions.lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("_batch")
              .parquet(candidatesDir)
            indexIO.overwrite(index.unionByName(bands).distinct())
          } else {
            indexIO.overwrite(bands)
          }
        }
        ()
      }
      .start()
}
