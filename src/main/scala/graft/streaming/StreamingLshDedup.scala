package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.MinHashLSH
import graft.functions.TextFunctions
import graft.sources.ParquetTableIO

/** Streaming near-duplicate detection: every micro-batch of documents
  * is probed against the PERSISTED MinHash band index (d10's
  * incremental discipline wired into Structured Streaming), its
  * candidates appended to a result table, and its own bands appended
  * to the index — so each document's text is shingled exactly once,
  * in the batch that carried it.
  *
  * Index layout — base + delta, so PER-BATCH COST IS O(batch), never
  * O(index):
  *
  *   indexDir/base/        versioned-pointer snapshot (ParquetTableIO)
  *   indexDir/delta/_batch=<id>/   one immutable partition per batch
  *
  * A batch writes ONLY its own `_batch=<id>` delta partition (dynamic
  * partition overwrite — a replayed batch replaces its own files, no
  * other partition is touched). The probe join reads base ∪ delta,
  * the only legitimate per-batch O(index) cost, and shuffles only the
  * small (band, bucket) keys. Every `compactEvery` batches the delta
  * partitions are folded into the base via the pointer commit
  * (readers keep resolving the old snapshot until the atomic pointer
  * swap) and the absorbed delta partitions are deleted — the
  * lakehouse merge-on-read shape.
  *
  * Replay safety: a micro-batch retried after a crash re-derives the
  * identical (deterministic) bands; candidates and the batch's delta
  * partition are both written with dynamic partition overwrite, so a
  * retry replaces its own output instead of appending a second copy;
  * the probe join drops id_index == id_probe (a replayed batch probes
  * an index that may already hold its own bands). A batch replayed
  * AFTER a compaction absorbed it re-creates its delta partition next
  * to the base copy — duplicate band rows are harmless (candidate
  * pairs are distinct'd; the next compaction distincts the index) and
  * never lose data.
  */
object StreamingLshDedup {

  private def baseIO(indexDir: String) =
    new ParquetTableIO(Paths.get(indexDir, "base").toString)
  private def deltaDir(indexDir: String): Path = Paths.get(indexDir, "delta")

  private def readIndexOpt(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val base = baseIO(indexDir)
    val delta = deltaDir(indexDir)
    val parts = Seq(
      if (base.exists) Some(base.read(spark)) else None,
      if (Files.exists(delta) && {
          // close the DirectoryStream — this runs once per micro-batch,
          // an unclosed listing leaks one fd per batch until GC
          val s = Files.list(delta)
          try s.anyMatch(_.getFileName.toString.startsWith("_batch="))
          finally s.close()
        })
        Some(spark.read.parquet(delta.toString).drop("_batch"))
      else None).flatten
    parts.reduceOption(_.unionByName(_))
  }

  /** base ∪ delta view of the band index (doc id, band, bucket). */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    readIndexOpt(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"no band index at $indexDir"))

  /** Fold all delta partitions into the base snapshot (one pointer
    * commit, computed FROM the old base while readers still resolve
    * it), then delete exactly the delta partitions that were read.
    * Runs inside the micro-batch callback on the `compactEvery`
    * cadence, or standalone as an offline hygiene pass.
    */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    val delta = deltaDir(indexDir)
    if (!Files.exists(delta)) return
    val absorbed = {
      val s = Files.list(delta)
      try s.filter(_.getFileName.toString.startsWith("_batch="))
        .toArray.toSeq.map(_.asInstanceOf[Path])
      finally s.close()
    }
    if (absorbed.isEmpty) return
    val base = baseIO(indexDir)
    val deltaDf = spark.read.parquet(delta.toString).drop("_batch")
    val merged = if (base.exists) base.read(spark).unionByName(deltaDf) else deltaDf
    base.overwrite(merged.distinct())
    absorbed.foreach(deleteTree)
  }

  /** Start the pipeline on a streaming documents DataFrame.
    *
    * @param indexDir      root of the base+delta band index layout
    * @param candidatesDir plain parquet dir the (id_index, id_probe)
    *                      candidate pairs are appended to
    * @param compactEvery  fold delta partitions into the base snapshot
    *                      every this many batches; 0 = never (run
    *                      [[compactIndex]] offline instead)
    * @param maxIndexPerBucket cap on index witnesses per (band, bucket)
    *                      in the probe join (deterministic smallest-id
    *                      truncation — the engine-wide candidate-volume
    *                      knob). On duplication-heavy streams hot
    *                      buckets otherwise make per-batch candidate
    *                      OUTPUT quadratic in duplication; a probe doc
    *                      still surfaces as a duplicate (the earliest
    *                      witnesses are the kept ones), only redundant
    *                      extra witnesses drop. Int.MaxValue = exact.
    */
  def start(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, indexDir: String, candidatesDir: String,
      checkpoint: String, trigger: Trigger,
      compactEvery: Int = 0,
      maxIndexPerBucket: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val norm = TextFunctions.normalize(col(textCol))
          // A micro-batch's partitioning reflects its source (often 1
          // partition from a memory/file source), and SkewTools.fanOut
          // deliberately passes non-file inputs through — so spread the
          // batch across all cores HERE: one O(batch) shuffle of raw
          // docs unlocks parallel shingling/minhashing (measured 8.6 s
          // -> 1.1 s per 7.5k-doc batch on local[32]).
          val spread = batch.repartition(
            batch.sparkSession.sparkContext.defaultParallelism)
          // signatures computed ONCE per batch, reused for probe + append
          val bands = MinHashLSH.bandedIndex(spread, idCol, norm)
            .localCheckpoint(true)
          // cold start probes an empty index of the batch's own schema
          val index = readIndexOpt(batch.sparkSession, indexDir)
            .getOrElse(bands.limit(0))
          MinHashLSH.probeCandidatesBanded(index, bands, idCol,
              maxIndexPerBucket)
            .withColumn("_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(candidatesDir)
          // O(batch) append: only this batch's partition is written
          bands.withColumn("_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(deltaDir(indexDir).toString)
          if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
            compactIndex(batch.sparkSession, indexDir)
        }
        ()
      }
      .start()

  private def deleteTree(dir: Path): Unit =
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
}
