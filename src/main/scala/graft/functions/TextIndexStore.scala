package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.{ArtifactStore, ParquetTableIO}

/** Persisted text-search index over a corpus directory — the
  * build-once / query-many discipline made concrete (the same pattern
  * d10 follows for its stored LSH index, and what Elasticsearch's
  * segment build amortizes for the reference).
  *
  * Each piece (postings, positional postings, corpus stats) is a
  * versioned `ParquetTableIO` snapshot keyed by the corpus directory
  * AND a content fingerprint of its files (ArtifactStore — sizes and
  * mtimes, not just a row count), so a different or IN-PLACE REGROWN
  * corpus can never read a stale index — it simply keys to a fresh
  * build. The first caller pays the one-off build; every later query
  * (same process or not) reads the stored parquet, which is where the
  * term filter lands as a pushed predicate — per-query work
  * proportional to the MATCHED postings, never the corpus. Values are
  * identical to an inline build: postings rows are exact
  * integers/strings, and n_docs/avgdl are exact (long count, long
  * sum / count) regardless of partition order, so persisted-index
  * query results hash-match the rebuild-inline oracles.
  *
  * `SPARK_GRAFT_INDEX_DIR` overrides the store root (defaults under
  * the build's target dir, so `clean` drops the cache with everything
  * else).
  */
object TextIndexStore {

  private def io(spark: SparkSession, sfDir: String, piece: String): ParquetTableIO =
    ArtifactStore.io(s"$sfDir/documents.parquet", piece)

  private def normCol = TextFunctions.normalize(col("text"))

  /** Stored (doc_id, term, tf, dl) postings of the `documents` table
    * at `sfDir`; built and committed on first use.
    */
  def postings(spark: SparkSession, sfDir: String): DataFrame = {
    val h = io(spark, sfDir, "postings")
    if (!h.exists)
      h.overwrite(TextSearch.postings(
        Tables.load(spark, sfDir, "documents"), "doc_id", normCol))
    h.read(spark)
  }

  /** Stored positional postings (doc_id, term, positions). */
  def positional(spark: SparkSession, sfDir: String): DataFrame = {
    val h = io(spark, sfDir, "positional")
    if (!h.exists)
      h.overwrite(TextSearch.positionalPostings(
        Tables.load(spark, sfDir, "documents"), "doc_id", normCol))
    h.read(spark)
  }

  /** Stored one-row corpus constants (n_docs, avgdl) — computed once
    * at index build; deriving them per query would re-aggregate the
    * whole index for two numbers.
    */
  def stats(spark: SparkSession, sfDir: String): DataFrame = {
    val h = io(spark, sfDir, "stats")
    if (!h.exists)
      h.overwrite(TextSearch.corpusStats(postings(spark, sfDir), "doc_id"))
    h.read(spark)
  }
}
