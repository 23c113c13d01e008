package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.ArtifactStore

/** Directory-partitioned (hive-style) table layout — the scan-time
  * complement of [[Bucketing]]: where bucketing pre-satisfies a JOIN's
  * distribution, partitioning pre-satisfies a FILTER. Rows land under
  * `partCol=<value>/` directories, so a predicate on the partition
  * column prunes whole directories during planning (the scan's
  * `PartitionFilters` — zero I/O for excluded partitions, before any
  * row is read), and a join against a filtered dimension prunes them
  * at RUNTIME through dynamic partition pruning (the broadcast side's
  * values become a `dynamicpruningexpression` on the fact scan). At
  * 100 TB this is the difference between reading a month and reading
  * the decade: the dominant cost of a time-ranged query is decided by
  * layout, not by the query plan.
  *
  * Same idempotence discipline as [[Bucketing.ensureBucketed]]: the
  * clustered write is the one-time price of the layout, so it is keyed
  * on a source fingerprint and skipped when current — a repeated
  * pipeline never rewrites it, a changed source always does.
  *
  * Reference analogue: none — the reference re-reads its whole source
  * window every sync (`pyCassElastic.py:199-212`); this is the layout
  * that makes such windows cheap at scale.
  */
object PartitionedLayout {

  private def loc(table: String): String =
    s"${ArtifactStore.root}/partitioned/$table"

  /** Write `df` partitioned by `partCol` unless the layout already
    * matches `fingerprint` (e.g. `ArtifactStore.fingerprint` of the
    * source path). Returns the layout location. The marker file rides
    * inside the layout directory (underscore-prefixed, invisible to
    * the parquet reader), so a partial overwrite can never present as
    * current.
    *
    * Single-writer discipline (same contract as
    * [[Bucketing.ensureBucketed]]): two sessions racing
    * `ensurePartitioned` on the same table race mode-overwrite
    * writes — pipelines share a layout through one writer. Readers
    * are safe against a CRASHED writer (the marker is written last,
    * so a torn layout re-registers as stale and rebuilds), not
    * against a concurrent one; the staged-commit upgrade path is the
    * `IncrementalDocArtifact` versioned-pointer pattern.
    */
  def ensurePartitioned(df: DataFrame, table: String, partCol: String,
      fingerprint: String): String = {
    val path = loc(table)
    val marker = Paths.get(path).resolve("_fingerprint")
    val fresh = Files.exists(marker) &&
      Files.readString(marker).trim == fingerprint
    if (!fresh) {
      df.write.mode("overwrite").partitionBy(partCol).parquet(path)
      Files.writeString(marker, fingerprint)
    }
    path
  }

  /** Read a layout back; the partition column is restored from the
    * directory names at planning time.
    */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(loc(table))
}
