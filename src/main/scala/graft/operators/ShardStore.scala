package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.Piece

/** Persisted shard layout, INCREMENTALLY maintained — shard id and
  * order key are pure per-document functions of the seeded key
  * ([[ShardExport]]), the textbook additive case for
  * [[IncrementalDocArtifact]]: a corpus file append assigns ONLY the
  * new documents (O(new)), each increment landing as one delta
  * generation clustered by shard; any other corpus change keys a full
  * rebuild. Hash sharding makes increments append-only BY
  * CONSTRUCTION: existing documents never move shards when the corpus
  * grows (the stability `ShardExportSpec` pins), so the stored layout
  * is always exactly the batch layout — no reshuffle, no rebalance
  * step, no "shard map" version to migrate.
  *
  * The stored piece is the NARROW loader manifest side: (doc_id,
  * shard, order_key, tok, bytes). A training loader plans from
  * [[manifest]] (one aggregate over the store) and reads its shard's
  * rows via the assignment join or a materialized [[ShardExport]]
  * export; the stats columns keep the manifest exact without touching
  * corpus text again.
  */
object ShardStore {

  private def handle(corpusPath: String, numShards: Int, seed: String) =
    IncrementalDocArtifact(corpusPath, s"shard$numShards-$seed", Seq(
      Piece("assign", (docs, _) =>
        ShardExport.assign(docs, "doc_id", numShards, seed)
          .select(col("doc_id"), col("shard"), col("order_key"),
            graft.functions.TextFunctions.tokenCount(
              graft.functions.TextFunctions.normalize(col("text")))
              .cast("long").as("tok"),
            octet_length(col("text")).cast("long").as("bytes"))
          .sortWithinPartitions("shard", "order_key"))))

  /** Stored per-doc (shard, order_key, tok, bytes) over `table` at
    * `sfDir`; built on first use, advanced O(new) on corpus appends.
    */
  def assignments(spark: SparkSession, sfDir: String, table: String,
      numShards: Int, seed: String): DataFrame =
    handle(s"$sfDir/$table.parquet", numShards, seed).serve(spark, "assign")

  /** Per-shard manifest from the STORED assignments — identical to
    * [[ShardExport.manifest]] (per-doc stats are deterministic), but
    * the corpus text is never rescanned.
    */
  def manifest(spark: SparkSession, sfDir: String, table: String,
      numShards: Int, seed: String): DataFrame =
    assignments(spark, sfDir, table, numShards, seed)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
        sum(col("bytes")).as("n_bytes"),
        min(col("order_key")).as("first_key"),
        max(col("order_key")).as("last_key"))
      .orderBy("shard")

  /** Offline compaction hook. */
  def compact(spark: SparkSession, corpusPath: String, numShards: Int,
      seed: String): Unit =
    handle(corpusPath, numShards, seed).compact(spark)
}
