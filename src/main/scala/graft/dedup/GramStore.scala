package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.Piece

/** Persisted per-document word-n-gram table, INCREMENTALLY maintained —
  * the corpus side of benchmark decontamination. A production pipeline
  * screens every release and every new eval set against the SAME
  * training corpus; re-deriving corpus grams per check is an O(corpus
  * bytes) scan (the dominant side: the corpus is 100 TB, the benchmark
  * is thousands of docs). Gram extraction is a pure per-document
  * function, so the table is a textbook additive piece: a corpus file
  * append extracts grams for the new files only, any other change keys
  * a full rebuild through the engine's ledger.
  *
  * Stored per-doc (not pre-distincted corpus-wide) so any corpus SLICE
  * can build its gram set by filtering — the d12 split (train ids vs
  * held-out ids) is a filter on the stored table, and the distinct
  * collapses map-side in the consuming join.
  */
object GramStore {

  private def norm = TextFunctions.normalize(col("text"))

  private def handle(corpusPath: String, n: Int) =
    IncrementalDocArtifact(corpusPath, s"grams_n$n", Seq(
      Piece("grams", (docs, _) => docs.select(col("doc_id"),
        explode(array_distinct(Decontam.wordGrams(norm, n))).as("gram")))))

  /** Stored (doc_id, gram) — each doc's DISTINCT word n-grams — over
    * `table`'s text at `sfDir`; built on first use, advanced O(new)
    * when the corpus grows. Docs shorter than n tokens contribute no
    * rows (they have no grams to leak).
    */
  def grams(spark: SparkSession, sfDir: String, table: String, n: Int): DataFrame =
    handle(s"$sfDir/$table.parquet", n).serve(spark, "grams")

  /** Offline compaction hook. */
  def compact(spark: SparkSession, corpusPath: String, n: Int): Unit =
    handle(corpusPath, n).compact(spark)
}
