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
  /** Temperature-flattened mixture sampling — the data-mixing step a
    * pretraining pipeline runs over heterogeneous sources (the
    * exponent-α reweighting multilingual corpora use to keep dominant
    * sources from drowning the tail): source s with n_s documents
    * gets mixture weight n_s^α / Σ_t n_t^α (α = 1 preserves natural
    * proportions, α → 0 approaches uniform-by-source) and keep rate
    * r_s = min(1, targetFraction · N · w_s / n_s).
    *
    * Scale shape: rates derive from ONE map-side count aggregate
    * (|sources| rows) whose result is broadcast back onto the corpus —
    * the corpus itself is never shuffled; the membership filter is the
    * same codegen'd deterministic `hashBucket` predicate as
    * [[stratifiedHash]], so re-runs, engine changes, and repartitions
    * never flip a row. Threshold is `floor(r·4096 + ½)` computed with
    * the identical expression in the DuckDB oracle.
    *
    * Returns (source, n_total, threshold) per source; [[mixture]]
    * applies it.
    */
  def mixtureThresholds(df: DataFrame, srcCol: String, alpha: Double,
      targetFraction: Double): DataFrame = {
    val counts = df.groupBy(srcCol).agg(count(lit(1)).as("n_total"))
    val tot = counts.agg(
      sum(col("n_total")).cast("double").as("_N"),
      sum(pow(col("n_total").cast("double"), alpha)).as("_Z"))
    val rate = least(lit(1.0),
      lit(targetFraction) * col("_N")
        * pow(col("n_total").cast("double"), alpha) / col("_Z")
        / col("n_total").cast("double"))
    counts.crossJoin(broadcast(tot))
      .select(col(srcCol), col("n_total"),
        floor(rate * buckets + 0.5).cast("int").as("threshold"))
  }

  /** The mixture-sampled corpus: rows whose key-bucket clears their
    * source's temperature-flattened threshold. NULL source is a
    * legitimate group of its own (the documents fixture has them), so
    * the broadcast join is null-safe.
    */
  def mixture(df: DataFrame, keyCol: String, srcCol: String, alpha: Double,
      targetFraction: Double): DataFrame = {
    val thr = mixtureThresholds(df, srcCol, alpha, targetFraction)
      .select(col(srcCol).as("_mix_src"), col("threshold"))
    df.join(broadcast(thr), col(srcCol) <=> col("_mix_src"))
      .filter(hashBucket(col(keyCol)) < col("threshold"))
      .drop("_mix_src", "threshold")
  }

  def weightedPriority(df: DataFrame, keyCol: String, weight: Column): DataFrame = {
    // (bucket + 1) / (buckets + 1) keeps u strictly INSIDE (0, 1):
    // dividing by `buckets` would give bucket 4095 (keys whose md5
    // starts 'fff') u = 1.0 exactly, priority -ln(1)/w = 0 — always
    // sampled regardless of weight
    val u = (hashBucket(col(keyCol)) + 1).cast("double") / (buckets + 1)
    df.withColumn("_priority", -log(u) / weight)
  }
}
