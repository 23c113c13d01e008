package graft.dedup

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Bloom-prefiltered incremental dedup — the 100 TB path for "which
  * rows of this batch have never been seen before".
  *
  * The exact form (ExactDedup / the d8 query) anti-joins the new batch
  * against the full seen-fingerprint set: one shuffle of BOTH sides,
  * and the seen side is the whole corpus history — at scale that
  * shuffle dominates every tick. This operator splits the batch with a
  * driver-built Bloom filter over the seen fingerprints:
  *
  *   - `mightContain == false` → DEFINITELY new (Bloom filters have no
  *     false negatives): emitted immediately, zero shuffle;
  *   - `mightContain == true`  → maybe seen (true duplicate or false
  *     positive, rate `fpp`): only this residue — duplicates plus
  *     ~fpp of the uniques — pays the exact anti-join.
  *
  * Result is therefore EXACTLY the anti-join's (false positives are
  * refined away; false negatives are impossible), but the shuffled
  * volume drops from |batch| + |seen| to |dups| + fpp·|batch| + the
  * seen side's join build. On mostly-novel corpora (the common crawl
  * shape) that is a >10× reduction. The filter itself is one compact
  * bit array built by a distributed aggregate (`stat.bloomFilter`) and
  * broadcast — ~1.2 GB for 10⁹ items at 1% fpp, sized by
  * `expectedItems`; beyond that, partition the seen set and stack
  * filters.
  *
  * The mightContain probe is the engine's one deliberate UDF: Spark's
  * BloomFilter expression surface is internal-only, and the probe is a
  * bit-test — not worth a custom Expression until profiles say so
  * (documented exception to the zero-UDF stance, SURVEY.md §2.11).
  */
object BloomDedup {

  /** Rows of `batch` whose `fpCol` value does not occur in
    * `seen.fpCol`. Exact — equivalent to
    * `batch.join(seen, Seq(fpCol), "left_anti")`.
    */
  def newRows(
      batch: DataFrame,
      seen: DataFrame,
      fpCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bloom = seen.stat.bloomFilter(fpCol, expectedItems, fpp)
    val bc = batch.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bc.value.mightContainString(s))
    // flag ONCE and materialize (the batch is the small per-tick side):
    // two complementary lazy filters would re-run the batch's upstream
    // and the probe UDF twice, and the broadcast would have to outlive
    // this call. After the eager checkpoint the bit array is no longer
    // needed — release it instead of leaking one broadcast per tick.
    val flagged = batch.withColumn("__maybe", mightContain(col(fpCol)))
      .localCheckpoint(true)
    bc.destroy()
    val definitelyNew = flagged.filter(!col("__maybe")).drop("__maybe")
    val residue = flagged.filter(col("__maybe")).drop("__maybe")
      .join(seen.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
    definitelyNew.unionByName(residue)
  }
}
