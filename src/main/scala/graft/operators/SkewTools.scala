package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives.
  *
  * AQE handles sort-merge-join skew at runtime, but two shapes still
  * need manual salting at 100 TB:
  *
  *  1. high-cardinality aggregation states under a hot key (e.g.
  *     collect_list / distinct-agg where one key owns 10% of rows):
  *     partial aggregation doesn't collapse them map-side, so one
  *     reducer drowns. `saltedAgg` splits every key into `salt`
  *     subkeys (deterministic spread on a secondary column's hash),
  *     aggregates, then merges the per-salt partials — two small
  *     shuffles instead of one skewed one.
  *
  *  2. broadcast-impossible joins against a skewed key: replicate the
  *     small side `salt`× and salt the big side (not shipped here —
  *     AQE's skew-join split covers our join shapes).
  *
  * The salt is DETERMINISTIC (hash of a caller-chosen spread column,
  * never rand()): replays and retries must produce identical results,
  * and Spark may re-execute tasks at any time.
  */
object SkewTools {

  /** Fan a CPU-bound derivation out to the session's parallelism when
    * the source arrives under-partitioned. A small dimension parquet is
    * one file → one task, and an explode-then-hash pipeline downstream
    * of it runs single-threaded no matter how many cores exist
    * (measured: the MinHash shingle stage at 1 vs 32 partitions is
    * 11.3 s vs 3.2 s on local[32]). At real scale inputs split by
    * `files.maxPartitionBytes` and this is a no-op; the round-robin
    * shuffle it inserts costs only the (small) source's bytes.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Two-phase aggregation: group on (keys, salt(spreadCol)) first,
    * then merge partials per key. `partial` must be decomposable with
    * `merge` (sum/sum, count/sum, min/min, max/max, ...).
    *
    * @param partial per-(key,salt) aggregate columns (aliased)
    * @param merge   per-key merge of the partial columns (aliased) —
    *                refer to the partial aliases by name
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], spreadCol: Column,
      salt: Int, partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.withColumn("_salt", pmod(xxhash64(spreadCol), lit(salt)))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
