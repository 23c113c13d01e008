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
    // Deliberately LAZY (no checkpoint, no bc.destroy): the union's
    // two branches re-evaluate the batch's upstream, but the result
    // stays recomputable after executor loss — an eager checkpoint +
    // destroyed broadcast would make a lost block fatal mid-tick.
    // The bloom-negative branch is the one that must never shuffle;
    // both branches re-scanning the (small, per-tick) batch is the
    // cheap side of that trade — callers looping over ticks can
    // persist `batch` themselves if its upstream is expensive. The
    // broadcast is reclaimed by Spark's ContextCleaner once the
    // returned plan is unreferenced.
    val definitelyNew = batch.filter(!mightContain(col(fpCol)))
    val residue = batch.filter(mightContain(col(fpCol)))
      .join(seen.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
    definitelyNew.unionByName(residue)
  }
}
