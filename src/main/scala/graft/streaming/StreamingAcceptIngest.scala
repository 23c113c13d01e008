package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.BloomDedup
import graft.functions.TextFunctions
import graft.sources.{CorpusLanding, IncrementalDocArtifact}
import graft.sources.IncrementalDocArtifact.Piece

/** The SELF-REFERENTIAL ingest-dedup loop — the canonical
  * training-data front door: documents arrive continuously, each
  * micro-batch is exact-deduplicated against EVERYTHING PREVIOUSLY
  * ACCEPTED (not just a watermarked window — [[StreamingPipeline]]'s
  * `dropDuplicatesWithinWatermark` bounds state by forgetting; a
  * corpus builder cannot forget), and the survivors LAND as corpus
  * generations ([[CorpusLanding]]) of the accepted corpus itself. The
  * stored digest screen the next batch reads is a derived artifact of
  * that same corpus, advanced O(batch) per landing — so the loop's
  * only growing cost is the Bloom build over the compact stored
  * fingerprints (one map-side-combinable aggregate; 16-byte rows),
  * never a rescan or reshuffle of the corpus text.
  *
  * Per batch: (1) in-batch first-wins dedup (min id per fingerprint
  * — the [[graft.dedup.ExactDedup]] convention, deterministic under
  * replay); (2) Bloom-prefiltered exact screen against the stored
  * digests of STRICTLY EARLIER batches; (3) survivors land with
  * their fingerprint and an `_ib` (ingest-batch) column.
  *
  * THE `_ib` ANCHOR is what makes replay exact. A crash mid-landing
  * can leave a prefix of batch k's files, and a concurrent serve may
  * have already advanced the digest artifact over them — so a naive
  * replay would see its own survivors as "already accepted", screen
  * them out, and land a DIFFERENT survivor set under the same
  * deterministic names (silent corruption: the parts guard only
  * protects same-content replays). Screening against `_ib < k`
  * excludes the batch's own partial landing, so the replay computes
  * the IDENTICAL survivor set and lands exactly the missing files.
  *
  * At-least-once in, exactly-once accepted corpus out; every store
  * keyed by the accepted-corpus path (co-occurrence, TF-IDF, bands,
  * …) maintains itself over it with the full artifact ops plane.
  */
object StreamingAcceptIngest {

  private def corpusDir(outDir: String): String = s"$outDir/corpus"

  /** Stored (doc id, fp, _ib) digests of the accepted corpus — the
    * loop's own screen artifact. Column names are whatever the
    * caller ingests with; the artifact key carries them.
    */
  private def digestHandle(corpusPath: String, idCol: String,
      textCol: String) =
    IncrementalDocArtifact(corpusPath, s"accept_${idCol}_$textCol", Seq(
      Piece("digests", (docs, _) =>
        docs.select(col(idCol), col("fp"), col("_ib")),
        // cluster by fp: the residue anti-join and any exact lookup
        // probe by fingerprint; _ib rides along for the replay anchor
        fold = Some(_.repartition(col("fp"))
          .sortWithinPartitions("fp", "_ib")))))

  /** Accept one batch: in-batch dedup, screen vs earlier batches,
    * land survivors, advance the digest artifact. The manual /
    * backfill door, and the micro-batch body of [[start]].
    *
    * @param expectedItems Bloom sizing for the seen side — the
    *   accepted-corpus cardinality this loop is provisioned for
    */
  def applyBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, outDir: String, parts: Int = 1,
      expectedItems: Long = 4000000L): Unit = {
    if (batch.isEmpty) return
    require(!batch.columns.contains("fp") && !batch.columns.contains("_ib"),
      "the ingested frame must not carry 'fp' or '_ib' columns — the " +
        "accept loop owns them (they land with the rows)")
    val spark = batch.sparkSession
    val corpus = corpusDir(outDir)
    CorpusLanding.requireLocal(outDir)
    val withFp = batch.withColumn("fp",
      TextFunctions.fingerprint(TextFunctions.normalize(col(textCol))))
    // in-batch first-wins: min id per fingerprint — deterministic
    // under replay (no dependence on arrival order inside the batch)
    val w = Window.partitionBy("fp").orderBy(col(idCol))
    val inBatch = withFp.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
    val fresh =
      if (CorpusLanding.hasData(corpus)) {
        // the replay anchor: strictly-earlier batches only (class doc)
        val seen = digestHandle(corpus, idCol, textCol)
          .serve(spark, "digests")
          .where(col("_ib") < batchId).select("fp")
        BloomDedup.newRows(inBatch, seen, "fp", expectedItems)
      } else inBatch
    // pinned: the emptiness check and the landing must read ONE
    // evaluation of the screen (not re-run the bloom + residue join)
    val survivors = fresh.withColumn("_ib", lit(batchId))
      .localCheckpoint()
    // survivors can be empty (an all-duplicate batch): nothing lands,
    // nothing advances — the replay of such a batch is trivially
    // idempotent (same screen, same empty survivor set)
    if (!survivors.isEmpty) {
      CorpusLanding.land(survivors, batchId, corpus, hashCol = "fp",
        parts = parts)
      // tick: advance the digest artifact over the landed generation
      digestHandle(corpus, idCol, textCol).serve(spark, "digests")
      ()
    }
  }

  def start(docs: DataFrame, idCol: String, textCol: String,
      outDir: String, checkpoint: String, trigger: Trigger,
      expectedItems: Long = 4000000L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, idCol, textCol, outDir,
          expectedItems = expectedItems)
      }
      .start()

  /** The accepted corpus — every surviving document row (original
    * columns + `fp` + `_ib`). This IS a corpus directory: any
    * corpus-keyed store pointed at it maintains itself over the
    * accepted set.
    */
  def accepted(spark: SparkSession, outDir: String): DataFrame = {
    val corpus = corpusDir(outDir)
    if (!CorpusLanding.hasData(corpus)) throw new IllegalStateException(
      s"no accepted documents under $outDir — start the stream (or " +
        "point at its outDir) before reading")
    spark.read.parquet(corpus)
  }

  /** The corpus directory path of this loop's accepted set — the
    * address to hand other corpus-keyed stores.
    */
  def acceptedCorpusPath(outDir: String): String = corpusDir(outDir)

  /** Stored digest view (id, fp, _ib) — the screen artifact. */
  def digests(spark: SparkSession, outDir: String, idCol: String,
      textCol: String): DataFrame =
    digestHandle(corpusDir(outDir), idCol, textCol)
      .serve(spark, "digests")

  /** Fold the digest artifact now (also runs on the store cadence). */
  def compact(spark: SparkSession, outDir: String, idCol: String,
      textCol: String): Unit =
    digestHandle(corpusDir(outDir), idCol, textCol).compact(spark)
}
