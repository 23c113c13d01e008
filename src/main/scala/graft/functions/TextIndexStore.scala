package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.ParquetTableIO

/** Persisted text-search index over a corpus directory — the
  * build-once / query-many discipline made concrete (the same pattern
  * d10 follows for its stored LSH index, and what Elasticsearch's
  * segment build amortizes for the reference).
  *
  * Each piece (postings, positional postings, corpus stats) is a
  * versioned `ParquetTableIO` snapshot keyed by the corpus directory
  * AND its row count, so a different or regrown corpus can never read
  * a stale index — it simply keys to a fresh build. The first caller
  * pays the one-off build; every later query (same process or not)
  * reads the stored parquet, which is where the term filter lands as
  * a pushed predicate — per-query work proportional to the MATCHED
  * postings, never the corpus. Values are identical to an inline
  * build: postings rows are exact integers/strings, and
  * n_docs/avgdl are exact (long count, long sum / count) regardless
  * of partition order, so persisted-index query results hash-match
  * the rebuild-inline oracles.
  *
  * `SPARK_GRAFT_INDEX_DIR` overrides the store root (defaults under
  * the build's target dir, so `clean` drops the cache with everything
  * else).
  */
object TextIndexStore {

  private def root: String = sys.env.getOrElse(
    "SPARK_GRAFT_INDEX_DIR", "/root/repo/target/graft_index")

  // corpus-identity keys memoized per process: the count is a cheap
  // metadata-ish job, but running it three times per query would put
  // fixed scheduling cost back on the hot path the store removes
  private val keys = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def io(spark: SparkSession, sfDir: String, piece: String): ParquetTableIO = {
    val key = keys.computeIfAbsent(sfDir, dir =>
      dir.replaceAll("[^A-Za-z0-9._-]", "_") + "_n" +
        Tables.load(spark, dir, "documents").count())
    new ParquetTableIO(s"$root/$key/$piece")
  }

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
