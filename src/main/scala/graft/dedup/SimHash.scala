package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 32-bit SimHash near-duplicate detection.
  *
  * Per token, 32 bits are read from the first 8 hex chars of md5
  * (4 bits per char); the document hash sets bit p iff a strict
  * majority of tokens have bit p set. Near-dups = pairs within a
  * small Hamming distance.
  *
  * Shape: explode tokens → 32 conditional sums per doc (one hash
  * aggregate with map-side combine) → bit-pack. The pair search
  * blocks on the TOP 16 BITS: simhashes within Hamming ≤ d of each
  * other usually agree on a long prefix, so the join keys on
  * `simhash >> 16` and verifies `bit_count(xor) <= d` inside blocks —
  * no cross product. (For guaranteed recall at scale, run the stricter
  * multi-block variant: 4 rotations of 8-bit blocks; this single-block
  * form is the cheap first pass.)
  *
  * All arithmetic is integer div/mod — identical in the DuckDB oracle.
  */
object SimHash {

  /** Sum over tokens of bit `p` of the token digest, read from the
    * PRE-DECODED numeric halves of the hex digest (`h1` = chars
    * 1..h1Len as a long, `h2` = chars h1Len+1..hexLen): hex char
    * j = p / 4 + 1 (1-based), bit-in-char b = p % 4 — the exact bit
    * the oracle's per-hex-char arithmetic reads, so the summed 0/1
    * values are identical. Until r16 this was 32 `instr`+`substring`
    * STRING ops per token row inside the aggregate; decoding the hex
    * once per token (two `conv`s) and extracting bits with long
    * shift/mask arithmetic keeps the hot aggregate in cheap
    * whole-stage-codegen integer ops (guide step 2: per-task work —
    * measured 2.9 s → see OPTIMIZATION_r16.md, SimHash family).
    */
  private def bitOfHalves(h1: Column, h2: Column, p: Int,
      hexLen: Int): Column = {
    val j = p / 4 + 1
    val b = p % 4
    val h1Len = math.min(hexLen, 8)
    val v =
      if (j <= h1Len) shiftright(h1, 4 * (h1Len - j) + b)
      else shiftright(h2, 4 * (hexLen - j) + b)
    v.bitwiseAND(lit(1L))
  }

  /** df ⇒ (idCol, simhash) with one `bits`-wide signature per
    * document. 32 bits (8 md5 hex chars) is the oracle-checked
    * default; use `bits = 64` past ~50k docs so the blocked index's
    * block width outgrows log2(n) (see sizing note below). Bit-pack
    * via OR of distinct powers — exact for the full 64-bit range.
    * The md5 hex prefix is decoded to (≤ 2) longs once per token row
    * (`conv` halves of ≤ 8 hex chars each, so each fits a signed
    * long); every per-bit aggregate then reads its bit with integer
    * shifts — value-identical to reading the hex chars directly.
    */
  def compute(df: DataFrame, idCol: String, normTextCol: Column,
      bits: Int = 32): DataFrame = {
    require(bits > 0 && bits <= 64 && bits % 4 == 0, "bits must be 4..64, /4")
    val hexLen = bits / 4
    val h1Len = math.min(hexLen, 8)
    val hx = substring(md5(col("tok")), 1, hexLen)
    val toks = graft.operators.SkewTools.fanOut(df.select(col(idCol), normTextCol.as("_norm")))
      .select(col(idCol), explode(graft.functions.TextFunctions.tokens(col("_norm"))).as("tok"))
      .select(col(idCol),
        conv(substring(hx, 1, h1Len), 16, 10).cast("long").as("_h1"),
        (if (hexLen > h1Len) conv(substring(hx, h1Len + 1, hexLen - h1Len), 16, 10).cast("long")
         else lit(0L)).as("_h2"))
    val sums = toks.groupBy(col(idCol)).agg(
      count(lit(1)).as("n"),
      (0 until bits).map(p =>
        sum(bitOfHalves(col("_h1"), col("_h2"), p, hexLen)).as(s"b$p")): _*)
    sums.select(col(idCol),
      (0 until bits).map(p =>
        when(col(s"b$p") * 2 > col("n"), lit(1L << p)).otherwise(0L))
        .reduce(_ bitwiseOR _).as("simhash"))
  }

  /** Pairs within Hamming distance `maxDist`, blocked on the top 16
    * bits (see class doc for the recall caveat; `nearPairsBlocked` is
    * the guaranteed-recall form). Pair expansion is block-local
    * (PairGen): one shuffle on the block key, and the signature
    * computation's lineage runs once — a self-join would re-execute it
    * per side. Each doc has exactly one block, so pairs are already
    * distinct.
    */
  def nearPairs(sims: DataFrame, idCol: String, maxDist: Int = 6,
      maxBucket: Int = Int.MaxValue, bits: Int = 32): DataFrame = {
    // block on the top 16 bits of the `bits`-wide hash (mask clears
    // the sign-extension a 64-bit arithmetic shift would leave)
    val keyed = sims.select(
      shiftright(col("simhash"), bits - 16).bitwiseAND(lit(0xFFFFL)).as("blk"),
      struct(col(idCol), col("simhash")).as("p"))
    PairGen.pairsWithin(keyed, Seq("blk"), col("p"), maxBucket)
      .select(col("a." + idCol).as("id_a"), col("b." + idCol).as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Cross-table near-pairs: every (index doc, probe doc) pair within
    * Hamming `maxDist`, blocked on the same top-16-bit key as
    * [[nearPairs]] — the incremental-clustering probe (new signatures
    * against the stored signature table) and the batch form share one
    * edge predicate, which is what makes the incremental labelling
    * provably equal to a full rebuild. Output (id_a = index side,
    * id_b = probe side, hamming). Cost: probe rows × bucket occupancy,
    * never index².
    */
  def probePairs(index: DataFrame, probe: DataFrame, idCol: String,
      maxDist: Int = 6, bits: Int = 32): DataFrame = {
    def blk(c: Column): Column =
      shiftright(c, bits - 16).bitwiseAND(lit(0xFFFFL))
    val i = index.select(blk(col("simhash")).as("blk"),
      col(idCol).as("id_a"), col("simhash").as("_sa"))
    val p = probe.select(blk(col("simhash")).as("blk"),
      col(idCol).as("id_b"), col("simhash").as("_sb"))
    i.join(p, "blk")
      .select(col("id_a"), col("id_b"),
        bit_count(col("_sa").bitwiseXOR(col("_sb"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** GUARANTEED-recall near-pairs via the pigeonhole multi-block
    * index: the 32-bit simhash splits into `blocks` equal-width
    * blocks; two hashes within Hamming `maxDist < blocks` must agree
    * EXACTLY on at least one block, so indexing every (blockIdx,
    * blockValue) and verifying candidates finds every qualifying pair
    * — recall 1.0 by construction, versus `nearPairs`' single-block
    * heuristic. Cost: `blocks`× the index size and cross-block
    * duplicate candidates (deduped after verification).
    *
    * SIZING CONSTRAINT (measured, not theoretical): expected bucket
    * occupancy is n / 2^blockWidth, so candidate volume grows as
    * n² · blocks / 2^blockWidth — with 4×8-bit blocks that is fine at
    * 5k docs and ~80 M verifications at 100k. The block width must
    * outgrow log2(n): past ~50k docs move to a 64-bit simhash with
    * 16-bit blocks, or cap pathological buckets with `maxBucket`
    * (explicit recall sacrifice on the hottest values, bounded cost).
    */
  def nearPairsBlocked(sims: DataFrame, idCol: String,
      maxDist: Int = 3, blocks: Int = 4,
      maxBucket: Int = Int.MaxValue, bits: Int = 32): DataFrame = {
    require(maxDist < blocks,
      s"pigeonhole guarantee needs maxDist < blocks ($maxDist >= $blocks)")
    require(bits % blocks == 0, s"blocks must divide the $bits-bit hash")
    val width = bits / blocks
    val mask = (1L << width) - 1
    val blockVals = array((0 until blocks).map(b =>
      shiftright(col("simhash"), b * width).bitwiseAND(lit(mask))): _*)
    val idx = sims.select(
      struct(col(idCol), col("simhash")).as("p"),
      posexplode(blockVals).as(Seq("blk_i", "blk_v")))
    // pinned-parallelism bucket exchange (see SkewTools.spreadByKey):
    // the multi-block expansion + hamming verify + distinct all hang
    // off this one exchange and are CPU-dense per byte — AQE's
    // byte-based coalescer ran them single-task (d7 isolated
    // 2.66 -> 1.98 s with the pin)
    PairGen.pairsWithin(graft.operators.SkewTools.spreadByKey(
        idx, col("blk_i"), col("blk_v")),
      Seq("blk_i", "blk_v"), col("p"), maxBucket)
      .select(col("a." + idCol).as("id_a"), col("b." + idCol).as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }
}
