package graft.dedup

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Bloom-prefiltered incremental dedup — the 100 TB path for "which
  * rows of this batch have never been seen before".
  *
  * The exact form (ExactDedup / the d8 query) anti-joins the new batch
  * against the full seen-fingerprint set: one shuffle of BOTH sides,
  * and the seen side is the whole corpus history — at scale that
  * shuffle dominates every tick. This operator splits the batch with a
  * Bloom filter over the seen fingerprints:
  *
  *   - `might_contain == false` → DEFINITELY new (Bloom filters have no
  *     false negatives): emitted immediately, zero shuffle;
  *   - `might_contain == true`  → maybe seen (true duplicate or false
  *     positive, rate `fpp`): only this residue — duplicates plus
  *     ~fpp of the uniques — pays the exact anti-join.
  *
  * Result is therefore EXACTLY the anti-join's (false positives are
  * refined away; false negatives are impossible), but the shuffled
  * volume drops from |batch| + |seen| to |dups| + fpp·|batch| + the
  * seen side's join build. On mostly-novel corpora (the common crawl
  * shape) that is a >10× reduction.
  *
  * Fully expression-based — no UDF, no manual broadcast: the filter is
  * built by Spark's own `BloomFilterAggregate` as a SCALAR SUBQUERY
  * over the seen side and probed with `BloomFilterMightContain`
  * (registered as `graft_bloom_agg` / `graft_might_contain`; the same
  * expressions `InjectRuntimeFilter` plants for runtime join pruning,
  * so the probe stays inside whole-stage codegen). Both values hash
  * through `xxhash64`, build and probe alike.
  *
  * Sizing: `BloomFilterAggregate` silently clamps its parameters to
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
  * `.maxNumBits` (defaults 4 M items / 8 MB). A clamp never breaks
  * correctness — the fpp just degrades and more rows pay the exact
  * residue join — but past the cap either raise the confs or use
  * [[newRowsStacked]], which multiplies capacity by hash-partitioning
  * the seen set across `stacks` independent filters.
  */
object BloomDedup {

  /** optimal bit count for n items at false-positive rate p (the
    * standard -n·ln p / ln²2 formula the sketch library itself uses).
    */
  private[graft] def optimalNumBits(n: Long, p: Double): Long =
    math.max(64L, math.ceil(-n.toDouble * math.log(p) / (math.log(2) * math.log(2))).toLong)

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
    graft.plans.GraftFunctions.ensureRegistered(batch.sparkSession)
    val bloom = seen
      .agg(call_function("graft_bloom_agg", xxhash64(col(fpCol)),
        lit(expectedItems), lit(optimalNumBits(expectedItems, fpp))).as("_bf"))
      .scalar()
    // a null filter (pathological empty aggregate) must claim "maybe
    // seen" so the residue join keeps the result exact, never "new"
    val might = coalesce(
      call_function("graft_might_contain", bloom, xxhash64(col(fpCol))), lit(true))
    // Deliberately LAZY (no checkpoint): the union's two branches
    // re-evaluate the batch's upstream, but the result stays
    // recomputable after executor loss; the subquery result is
    // computed once and reused across both branches. The
    // bloom-negative branch is the one that must never shuffle;
    // callers looping over ticks can persist `batch` themselves if
    // its upstream is expensive.
    val definitelyNew = batch.filter(!might)
    val residue = batch.filter(might)
      .join(seen.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
    definitelyNew.unionByName(residue)
  }

  /** [[newRows]] past a single filter's sizing bound: the seen set is
    * hash-partitioned into `stacks` slices (`xxhash64(fp) mod m`) and
    * one filter is built PER SLICE — all in a single distributed pass
    * (one slice-keyed aggregate). A fingerprint can only live in the
    * slice its own hash selects, so each batch row probes exactly one
    * filter; a slice with no seen rows at all proves its batch rows
    * new outright.
    *
    * Capacity scales linearly in `stacks` while each aggregation
    * buffer stays inside the runtime-bloom-filter byte cap — at 10⁹
    * seen items and 1 % fpp, 150 slices of ~8 MB replace the ~1.2 GB
    * monolith no single buffer may hold. The probe side ships the
    * filters as ONE BROADCAST behind a native expression
    * ([[graft.plans.SlicedBloomProbe]]) — NOT as per-slice byte
    * literals: a binary literal hex-renders in full on every
    * plan-string pass (a 16 GB driver OOM'd rendering a 25-slice /
    * 120 MB probe plan, SURVEY §9.37) and re-ships with every task
    * binary, where the broadcast renders as its id and executors
    * fetch and deserialize the filters once.
    *
    * Exactness argument is [[newRows]]'s, per slice: no false
    * negatives within a slice, false positives refined by the same
    * residue anti-join.
    */
  def newRowsStacked(
      batch: DataFrame,
      seen: DataFrame,
      fpCol: String,
      expectedItems: Long,
      fpp: Double = 0.01,
      stacks: Int = 16): DataFrame = {
    require(stacks >= 1, s"stacks must be >= 1, got $stacks")
    graft.plans.GraftFunctions.ensureRegistered(batch.sparkSession)
    val perFilter = math.max(1L, (expectedItems + stacks - 1) / stacks)
    val numBits = optimalNumBits(perFilter, fpp)
    // one pass over seen builds every slice's filter; each filter is
    // driver-collected (that is the contract: individually they fit)
    val filters = new Array[org.apache.spark.util.sketch.BloomFilter](stacks)
    seen
      .groupBy(pmod(xxhash64(col(fpCol)), lit(stacks.toLong)).as("_slice"))
      .agg(call_function("graft_bloom_agg", xxhash64(col(fpCol)),
        lit(perFilter), lit(numBits)).as("_bf"))
      .collect()
      .foreach { r =>
        filters(r.getLong(0).toInt) =
          org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      }
    val bc = batch.sparkSession.sparkContext.broadcast(filters)
    // probe only the row's own slice; absent slice => definitely new
    // (null fp => "maybe", routed to the residue join, which keeps
    // null-keyed rows — same output as the old fall-through-to-new)
    val might: Column = coalesce(
      graft.plans.SlicedBloomProbe.column(xxhash64(col(fpCol)), stacks, bc),
      lit(true))
    val definitelyNew = batch.filter(!might)
    val residue = batch.filter(might)
      .join(seen.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
    definitelyNew.unionByName(residue)
  }
}
