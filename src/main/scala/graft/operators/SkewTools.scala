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
    * the source scan is genuinely under-split. A small dimension
    * parquet is one file → effectively one task (a parquet file with a
    * single row group does all its work in one split no matter how the
    * byte ranges are cut), and an explode-then-hash pipeline downstream
    * of it runs single-threaded no matter how many cores exist
    * (measured: the MinHash shingle stage at 1 vs 32 partitions is
    * 11.3 s vs 3.2 s on local[32]).
    *
    * Gating is on the SCAN LAYOUT, read from the logical plan — never
    * `df.rdd` (which forces a full plan→RDD conversion just to count
    * partitions). Two conditions must both hold before the round-robin
    * shuffle is inserted:
    *
    *  - fewer input files than cores (`df.inputFiles` — the cached
    *    file-index listing, no job): at real scale a table is
    *    thousands of files and this disarms the shuffle entirely;
    *  - the files are small enough that Spark's own
    *    `files.maxPartitionBytes` splitting cannot reach the target
    *    parallelism either (few LARGE files carry many row groups and
    *    split fine on their own — repartitioning them would shuffle
    *    gigabytes to fix a problem that doesn't exist).
    *
    * Non-file inputs (in-memory test frames, streaming micro-batch
    * sources) report zero input files and pass through untouched:
    * their partitioning was chosen by whoever materialized them.
    */
  def fanOut(df: DataFrame, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles.length
    if (files == 0 || files >= target) df
    else {
      val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (bytes / maxSplit >= target) df
      // keyed spread when the caller aggregates/combines BY those keys
      // downstream: round-robin scatters one key's rows across every
      // partition, so per-key partial aggregation leaks one partial
      // row per (key, partition) into the exchange — hash-spreading by
      // the key keeps each key's rows together and partials collapse
      // map-side (r17: v22's candidate dot-product exchange).
      else if (keys.nonEmpty) df.repartition(target, keys: _*)
      else df.repartition(target)
    }
  }

  /** Pin a CPU-dense pipeline's parallelism through an exchange AQE's
    * BYTE-based coalescer would collapse (r16). Candidate/verify
    * stages (array_intersect, levenshtein, per-pair estimators) cost
    * rows × per-row CPU, yet their rows are a few dozen BYTES each —
    * AQE sizes post-shuffle partitions by
    * `advisoryPartitionSizeInBytes`/`minPartitionSize`, so a
    * kilobyte-sized but CPU-hours-dense candidate stream coalesces to
    * ONE task and everything downstream of the exchange (broadcast
    * joins preserve partitioning) runs single-threaded (measured:
    * d24's entire prefix-expand → candidate-join → verify chain in one
    * 1.8 s single-task stage at sf0.1/local[32]).
    *
    * A USER-specified `repartition(numPartitions, keys)` is exempt
    * from AQE coalescing by contract (REPARTITION_BY_NUM), which makes
    * it the per-operator pin Spark actually offers. The count is
    * cores-proportional (`defaultParallelism`, floored by the session's
    * configured shuffle partitions), never a constant, so cluster
    * deployments spread exactly as wide as their session is sized.
    * Keyed (hash) partitioning, not round-robin: deterministic under
    * retries, and downstream groupBy/distinct on the same keys reuse
    * the exchange instead of adding one.
    */
  def spreadByKey(df: DataFrame, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sparkContext.defaultParallelism,
      spark.sessionState.conf.numShufflePartitions)
    df.repartition(n, keys: _*)
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
