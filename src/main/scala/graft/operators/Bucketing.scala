package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.ArtifactStore

/** Bucketed (hash-clustered) table layout — the co-located-join
  * technique: two tables written `bucketBy(n, key)` on the SAME key
  * with the SAME bucket count satisfy the join's required
  * distribution AT THE SCAN, so the join plans with NO Exchange on
  * either side. At 100 TB this converts the single largest cost of a
  * repeated fact⋈fact join (re-shuffling both inputs every query)
  * into a one-time layout decision at write — the same trade the
  * engine's partitionBy pruning makes for filters, applied to join
  * distribution. `sortBy(key)` additionally pre-orders rows inside
  * each bucket file so a sort-merge join reads presorted runs when a
  * bucket holds one file per bucket id.
  *
  * Catalog-backed on purpose (bucket metadata lives in the table
  * catalog, not in file layout), written as EXTERNAL tables under
  * [[ArtifactStore.root]] so nothing lands in the repo tree.
  *
  * Reference analogue: none directly — but this is the engine-side
  * answer to the reference's "both stores keyed by id" assumption
  * (pyCassElastic.py's id-keyed upserts): keep the key-clustered
  * layout so keyed operations never pay a shuffle.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", s"${ArtifactStore.root}/bucketed/$table")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** [[writeBucketed]] only when the layout is missing or stale —
    * the layout IS the point of bucketing (pay the clustered write
    * once, reuse the exchange-free distribution forever), so a
    * repeated pipeline must not rewrite it per run. `fingerprint`
    * names the source state (e.g. `ArtifactStore.fingerprint` of the
    * input paths); a fresh session over an already-written layout
    * re-registers the external table from the existing files (the
    * in-memory catalog does not outlive the JVM; the parquet files
    * and bucket spec do).
    */
  def ensureBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, fingerprint: String): Unit = {
    import java.nio.file.{Files, Paths}
    val spark = df.sparkSession
    val loc = s"${ArtifactStore.root}/bucketed/$table"
    val marker = Paths.get(loc).resolve("_fingerprint")
    val fresh = Files.exists(marker) &&
      Files.readString(marker).trim == fingerprint
    if (fresh) {
      if (!spark.catalog.tableExists(table)) {
        val cols = df.schema
          .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        spark.sql(s"CREATE TABLE `$table` ($cols) USING parquet " +
          s"CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $buckets BUCKETS " +
          s"LOCATION '$loc'")
      }
      return
    }
    writeBucketed(df, table, key, buckets)
    Files.writeString(marker, fingerprint)
  }

  /** Join two same-key bucketed catalog tables: with matching bucket
    * counts Spark's bucketing rule satisfies both sides' required
    * hash distribution from the scans — zero Exchange (plan-asserted
    * in the spec; a broadcast threshold of −1 shows the exchange-free
    * sort-merge form the layout exists for).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
