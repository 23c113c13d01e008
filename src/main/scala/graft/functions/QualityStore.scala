package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.Piece

/** Persisted per-document quality scores, INCREMENTALLY maintained —
  * t2's regex-heavy composite is a pure per-document function, the
  * textbook case for [[graft.sources.IncrementalDocArtifact]]'s
  * base+delta ledger: a corpus file append scores ONLY the new files
  * (O(new), never O(corpus) — §9.9 measured 34 s of d18's 100× cost as
  * exactly the full-corpus rescan this kills), any other change keys a
  * full rebuild, and consumers (quality-aware dedup keep, mixture
  * sampling, funnels) read one narrow (doc_id, quality) table.
  *
  * Determinism: qualityScore is round()ed fixed-point over exact
  * token/char counts, and scoring is per-doc — stored rows are
  * bit-identical to an inline scan however the corpus was chunked into
  * generations (asserted in `QualityStoreSpec`), so oracles that
  * recompute quality inline keep hash-matching.
  */
object QualityStore {

  private def handle(corpusPath: String) =
    IncrementalDocArtifact(corpusPath, "qt2", Seq(
      Piece("scores", (docs, _) => docs.select(col("doc_id"),
        TextFunctions.qualityScore(col("text"),
          TextFunctions.normalize(col("text"))).as("quality")))))

  /** Stored (doc_id, quality) over `table`'s `text` at `sfDir`; built
    * on first use, advanced incrementally when the corpus grows.
    */
  def scores(spark: SparkSession, sfDir: String, table: String): DataFrame =
    handle(s"$sfDir/$table.parquet").serve(spark, "scores")

  /** Offline compaction hook. */
  def compact(spark: SparkSession, corpusPath: String): Unit =
    handle(corpusPath).compact(spark)
}
