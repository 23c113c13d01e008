package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic shard export — the last step of a training-data
  * pipeline: lay the curated corpus out as N shards in a reproducible
  * pseudo-random document order, so a training run (and any re-run,
  * on any cluster size) reads the same examples in the same order.
  *
  * Sharding is HASH sharding: shard(id) = first 6 md5 hex nibbles of
  * "seed:id" mod numShards. Balanced in expectation by the law of
  * large numbers (the §9.13 probe measures realized skew at 1 M
  * docs), embarrassingly parallel, and stable — a document's shard
  * depends only on its key and the seed, never on run, partitioning,
  * or the rest of the corpus. The alternative, size-balanced bin
  * packing over a global cumulative sum, needs a single-partition
  * running window: the classic scale-killer this operator refuses.
  *
  * Within a shard, documents order by the full md5 hex of the same
  * seeded key — a deterministic pseudo-random permutation. Together
  * the two levels give the "global shuffle" training wants WITHOUT a
  * global sort: shard membership is hash-random, within-shard order
  * is hash-random, and `repartition(shard)` +
  * `sortWithinPartitions` is one shuffle with per-partition sorts.
  *
  * Same md5 determinism contract as [[Sampling]] (cross-engine,
  * oracle-reproducible); swap xxhash64 for raw throughput in
  * production — the shapes don't change.
  */
object ShardExport {

  /** Stable shard id in [0, numShards). */
  def shardOf(key: Column, numShards: Int, seed: String): Column =
    pmod(
      conv(substring(md5(concat_ws(":", lit(seed), key.cast("string"))), 1, 6),
        16, 10).cast("long"),
      lit(numShards.toLong)).cast("int")

  /** Deterministic within-shard order key (full md5 hex). */
  def orderKey(key: Column, seed: String): Column =
    md5(concat_ws(":", lit(seed), key.cast("string")))

  /** The frame plus `shard` and `order_key` columns — map-side only. */
  def assign(df: DataFrame, idCol: String, numShards: Int,
      seed: String): DataFrame =
    df.withColumn("shard", shardOf(col(idCol), numShards, seed))
      .withColumn("order_key", orderKey(col(idCol), seed))

  /** Per-shard manifest — the sidecar an export publishes so a
    * training loader can plan reads without opening data files:
    * doc / whitespace-token / byte totals plus the order-key range,
    * from ONE hash aggregate (map-side partials; |shards| result
    * rows).
    */
  def manifest(df: DataFrame, idCol: String, textCol: String,
      numShards: Int, seed: String): DataFrame = {
    val norm = graft.functions.TextFunctions.normalize(col(textCol))
    assign(df, idCol, numShards, seed)
      .select(col("shard"), col("order_key"),
        graft.functions.TextFunctions.tokenCount(norm).as("_tok"),
        octet_length(col(textCol)).as("_bytes"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_tok").cast("long")).as("n_tokens"),
        sum(col("_bytes").cast("long")).as("n_bytes"),
        min(col("order_key")).as("first_key"),
        max(col("order_key")).as("last_key"))
      .orderBy("shard")
  }

  /** Write the export: one shuffle keyed on shard, order_key-sorted
    * within each shard, parquet `shard=` partition dirs (a loader
    * reads its shard by path, no filter scan). Returns the manifest
    * of what was written.
    */
  def export(df: DataFrame, idCol: String, textCol: String, numShards: Int,
      seed: String, outDir: String): DataFrame = {
    assign(df, idCol, numShards, seed)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "order_key")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    manifest(df, idCol, textCol, numShards, seed)
  }
}
