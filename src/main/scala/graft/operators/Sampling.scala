package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling — the corpus downsampling step that
  * must be reproducible across runs, engines, and cluster sizes, so
  * no `rand()`, no `sample()`, no seed-and-partitioning-dependent
  * path. A row's membership depends only on its KEY: the first three
  * md5 hex chars map the key to one of 4096 buckets, and a row is
  * kept when its bucket falls below rate×4096. Re-running, adding
  * data, or changing parallelism never flips an existing row's
  * membership (the same property t6's train/val/test split relies
  * on, at finer rate resolution).
  *
  * Stratified form: per-stratum rates (e.g. downsample the dominant
  * language, keep the long tail) as a literal CASE chain — one
  * codegen'd filter, no shuffle, no per-stratum scans.
  */
object Sampling {

  val buckets = 4096 // 3 hex nibbles => rate resolution of 1/4096

  /** Stable bucket in [0, 4096) from a key column (any type; cast to
    * string first so engines agree on the hashed text).
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 3), 16, 10).cast("int")

  /** Keep-threshold bucket count for a rate in [0, 1]. */
  def thresholdFor(rate: Double): Int = math.round(rate * buckets).toInt

  /** Rows whose key-bucket clears the stratum's rate. `rates` maps
    * stratum value → sampling rate; strata not listed use
    * `defaultRate`.
    */
  def stratifiedHash(df: DataFrame, keyCol: String, strataCol: String,
      rates: Seq[(String, Double)], defaultRate: Double): DataFrame = {
    val thr = rates.foldRight(lit(thresholdFor(defaultRate)): Column) {
      case ((stratum, rate), els) =>
        when(col(strataCol) === stratum, lit(thresholdFor(rate))).otherwise(els)
    }
    df.filter(hashBucket(col(keyCol)) < thr)
  }

  /** Deterministic weighted sample without replacement (A-ExpJ /
    * exponential-jumps family): each row draws `u ∈ (0, 1]` from its
    * key hash and ranks by `-ln(u) / w` — an Exponential(w) variate,
    * so the k smallest ranks are a weighted-without-replacement sample
    * with inclusion probability increasing in `w`. Same determinism
    * contract as `stratifiedHash`: membership depends only on the key
    * and weight, never on run, engine, or partitioning.
    *
    * Returns the full frame with a `_priority` column; callers take
    * `orderBy("_priority").limit(k)` (TakeOrdered — a per-partition
    * bounded heap then a k-row driver merge, no global sort) or a
    * per-stratum ranking window.
    */
  def weightedPriority(df: DataFrame, keyCol: String, weight: Column): DataFrame = {
    // (bucket + 1) / (buckets + 1) keeps u strictly INSIDE (0, 1):
    // dividing by `buckets` would give bucket 4095 (keys whose md5
    // starts 'fff') u = 1.0 exactly, priority -ln(1)/w = 0 — always
    // sampled regardless of weight
    val u = (hashBucket(col(keyCol)) + 1).cast("double") / (buckets + 1)
    df.withColumn("_priority", -log(u) / weight)
  }
}
