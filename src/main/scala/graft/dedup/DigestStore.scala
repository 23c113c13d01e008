package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.Piece

/** Persisted per-document content fingerprints, INCREMENTALLY
  * maintained — the "seen" side of ingest-time exact dedup. A
  * production ingest screens every incoming batch against the corpus
  * it has already accepted; re-fingerprinting the corpus per batch is
  * the O(corpus) scan this kills (the reference's Cassandra leg keys
  * on content for the same reason). Fingerprinting is a pure per-doc
  * function → additive piece, O(new) per corpus increment.
  *
  * Consumers: `BloomDedup.newRows(batch, seen = DigestStore.digests…)`
  * — the driver-built Bloom over the STORED fingerprints splits the
  * batch so definite-new rows never shuffle, and only maybe-seen rows
  * pay the exact anti-join against the stored table.
  */
object DigestStore {

  private def handle(corpusPath: String) =
    IncrementalDocArtifact(corpusPath, "digests", Seq(
      Piece("digests", (docs, _) => docs.select(col("doc_id"),
        TextFunctions.fingerprint(
          TextFunctions.normalize(col("text"))).as("fp")))))

  /** Stored (doc_id, fp) over `table`'s text at `sfDir`; built on
    * first use, advanced O(new) when the corpus grows.
    */
  def digests(spark: SparkSession, sfDir: String, table: String): DataFrame =
    handle(s"$sfDir/$table.parquet").serve(spark, "digests")

  /** Offline compaction hook. */
  def compact(spark: SparkSession, corpusPath: String): Unit =
    handle(corpusPath).compact(spark)
}
