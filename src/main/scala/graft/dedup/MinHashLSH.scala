package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection.
  *
  * Pipeline: normalize → explode char-shingle positions → k seeded
  * min-hashes as a hash AGGREGATE (signature) → b bands of r rows →
  * bucket hash per band → bucket-local pair expansion → candidate
  * pairs → exact Jaccard on candidates only.
  *
  * Why the explode+aggregate shape instead of nested higher-order
  * functions: `array_min(transform(shingles, md5(...)))` with the
  * shingles themselves a `transform(sequence, substring(norm, ...))`
  * looks natural, but Catalyst inlines the aliased `norm` into every
  * lambda and every consumer — measured on this dataset the collapsed
  * band-index expression re-ran the regex normalization once per
  * shingle per seed per band (a 32× blowup) entirely outside
  * whole-stage codegen: 45 s for 500 documents. The explode form keeps
  * every step an attribute reference: one regex per document, one
  * substring per shingle, md5s inside a codegen'd partial aggregate
  * (map-side combine ⇒ the only shuffle carries one k-string signature
  * row per document). Same numbers, ~30× faster, and the shape is the
  * one that scales: signatures never materialize more than once.
  *
  * Scale analysis (the reason this shape is the 100 TB default):
  *  - signatures are computed in one pass; the shuffle to the
  *    signature aggregate is collapsed map-side to ≈|docs| rows;
  *  - the band-bucket exchange is keyed on (band, bucket) —
  *    cardinality ≈ b × |docs|, rows are (key, id), tiny;
  *  - pair expansion is bucket-local (PairGen) — the index's lineage
  *    executes once, not twice as a self-join would;
  *  - exact Jaccard runs only on bucket-colliding candidates, never
  *    the O(n²) cross product;
  *  - hot buckets (boilerplate shingles) are bounded by `maxBucket`,
  *    the standard guard against quadratic blowup on degenerate
  *    near-identical clusters (default = no cap: exact semantics).
  *
  * Hash family: ONE md5 per shingle, split into TWO independent
  * 60-bit bases (hex chars [1,15] and [16,30] — expressible
  * identically in the DuckDB oracle), then k universal hashes
  * `(a_s·x1 + b_s·x2 + c_s) mod p` over Mersenne prime p = 2^31-1 —
  * pure codegen'd long arithmetic. spark.ml's MinHashLSH uses the
  * one-base affine form `(a_s·x + b_s) mod p`; measured at k=8/sf0.1
  * (SURVEY.md §9) its across-seed rank correlation (every seed
  * re-ranks the SAME value ordering monotonically) yielded ~3.5× more
  * band collisions on a duplicate-heavy corpus. The two-base form
  * breaks that correlation (pair ordering varies per seed) while
  * still paying one digest per shingle: k digests per shingle is
  * infeasible at production k≥64, one digest plus 2k multiply-adds
  * is not.
  */
object MinHashLSH {

  val defaultK = 8 // signature length
  val defaultBands = 4 // => rows per band r = k / bands

  /** Mersenne prime 2^31-1: products a·base stay under 2^62 (no long
    * overflow) because both operands are first reduced mod p.
    */
  val P = 2147483647L

  /** Deterministic per-seed coefficients (Knuth + xxhash odd
    * constants); a_s, b_s ∈ (0, p), c_s ∈ [0, p).
    */
  def hashParams(s: Int): (Long, Long, Long) =
    ((2654435761L * (s + 1)) % P match { case 0 => 1L; case a => a },
      (2246822519L * (s + 1)) % P match { case 0 => 1L; case b => b },
      (3266489917L * (s + 1)) % P)

  /** Two independent 60-bit bases of one shingle: md5 hex chars
    * [1,15] and [16,30], each parsed as an integer and reduced mod p.
    * The md5-text route (instead of xxhash64) keeps the values
    * bit-identical in DuckDB:
    * `('0x' || substr(md5(sh), 1, 15))::BIGINT % p`.
    *
    * Why TWO bases: with a single base x, all k hashes (a_s·x + b_s)
    * are strictly monotone re-rankings of the same value ordering, so
    * the per-seed minima are rank-correlated across seeds and band
    * collisions inflate ~3.5× on duplicate-heavy corpora (measured,
    * SURVEY.md §9). With (x1, x2) the seeded combination
    * (a_s·x1 + b_s·x2 + c_s) mod p changes the relative order of any
    * two shingles from seed to seed, restoring near-independent
    * minima at the cost of one extra substring parse — no extra md5.
    */
  def baseHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long") % P

  def baseHash2(c: Column): Column =
    conv(substring(md5(c), 16, 15), 16, 10).cast("long") % P

  /** One universal-family hash of the pre-reduced base pair. Each
    * product is < p² < 2^62 and the two are reduced before the sum, so
    * nothing overflows a signed long.
    */
  private def seeded(base1: Column, base2: Column, s: Int): Column = {
    val (a, b, cc) = hashParams(s)
    ((lit(a) * base1) % P + (lit(b) * base2) % P + lit(cc)) % P
  }

  /** k-element MinHash signature of a shingle-array column. Column
    * form — for single-array contexts; the table pipeline below uses
    * the aggregate form instead (see class doc).
    */
  def signature(shingles: Column, k: Int = defaultK): Column =
    array((0 until k).map(s =>
      array_min(transform(shingles, x => seeded(baseHash(x), baseHash2(x), s)))): _*)

  /** Band digests: the signature's contiguous r-slices, each joined to
    * a string key. Two docs collide in a band iff that slice matches
    * exactly — the joined text IS the bucket key; re-hashing it (the
    * old md5 here) changes nothing about the collision structure.
    */
  def bandDigests(sig: Column, k: Int = defaultK, bands: Int = defaultBands): Column = {
    val r = k / bands
    array((0 until bands).map(b =>
      array_join(
        transform(slice(sig, b * r + 1, r), x => x.cast("string")), "|")): _*)
  }

  /** One (id, shingle) row per overlapping char n-gram. The normalized
    * text is materialized once per document; shingles are substrings
    * over exploded positions — all codegen, no lambda re-evaluation.
    * Texts shorter than n yield one (short) shingle so no document
    * ever has an empty set.
    */
  def shingleRows(df: DataFrame, idCol: String, normTextCol: Column, n: Int = 5): DataFrame =
    graft.operators.SkewTools.fanOut(df.select(col(idCol), normTextCol.as("_norm")))
      .select(col(idCol), col("_norm"),
        explode(sequence(lit(1), greatest(length(col("_norm")) - (n - 1), lit(1)))).as("_pos"))
      .select(col(idCol), substr(col("_norm"), col("_pos"), lit(n)).as("shingle"))

  /** One row per document with min-hash columns h0..h{k-1}: the
    * signature as a single hash aggregate over exploded shingles.
    */
  def signatureTable(df: DataFrame, idCol: String, normTextCol: Column,
      n: Int = 5, k: Int = defaultK): DataFrame =
    signatureTableFromShingles(shingleRows(df, idCol, normTextCol, n),
      idCol, k)

  /** [[signatureTable]] over a caller-provided (id, shingle) frame —
    * the shared-shingle entry point: a caller that needs the banded
    * index AND other shingle-derived aggregates over the same
    * documents (the near-mode accept tick's verification signature)
    * passes them as `extra` and gets everything from ONE explode and
    * ONE per-id aggregate — the doc-sized result is cheap to pin,
    * where pinning the exploded shingle frame itself is NOT (measured
    * §9.37: materializing ~chars-of-the-batch rows per tick cost more
    * than the second explode it saved). `extra` aggregates may
    * reference `shingle`.
    */
  def signatureTableFromShingles(sh: DataFrame, idCol: String,
      k: Int = defaultK, extra: Seq[Column] = Nil): DataFrame = {
    // one md5 per shingle ROW (not per seed): the k seeded hashes are
    // long arithmetic over the shared base pair inside the partial
    // aggregate
    val aggs = (0 until k).map(s =>
      min(seeded(col("_hb"), col("_hb2"), s)).as(s"h$s")) ++ extra
    sh
      .withColumn("_md5", md5(col("shingle")))
      .withColumn("_hb", conv(substring(col("_md5"), 1, 15), 16, 10).cast("long") % P)
      .withColumn("_hb2", conv(substring(col("_md5"), 16, 15), 16, 10).cast("long") % P)
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** doc_id → (band, bucket) exploded table, the LSH index. */
  def bandedIndex(df: DataFrame, idCol: String, normTextCol: Column,
      n: Int = 5, k: Int = defaultK, bands: Int = defaultBands): DataFrame =
    bandedIndexFromShingles(shingleRows(df, idCol, normTextCol, n),
      idCol, k, bands)

  /** [[bandedIndex]] over a caller-provided (id, shingle) frame (see
    * [[signatureTableFromShingles]] for when).
    */
  def bandedIndexFromShingles(sh: DataFrame, idCol: String,
      k: Int = defaultK, bands: Int = defaultBands): DataFrame =
    bandedIndexFromSignatures(
      signatureTableFromShingles(sh, idCol, k), idCol, k, bands)

  /** The banding step alone, over an already-computed signature table
    * (h0..h{k-1} columns + whatever else rides along) — lets a caller
    * pin the doc-sized signature table once and derive both the index
    * and its other signature consumers from the pin.
    */
  def bandedIndexFromSignatures(sig: DataFrame, idCol: String,
      k: Int = defaultK, bands: Int = defaultBands): DataFrame = {
    val sigArr = array((0 until k).map(i => col(s"h$i")): _*)
    sig.select(col(idCol),
      posexplode(bandDigests(sigArr, k, bands)).as(Seq("band", "bucket")))
  }

  /** The SEEDED-MIX signature family: ONE `xxhash64` per shingle row
    * and k (+verK) seeded splitmix64-avalanche mixes
    * ([[graft.plans.Mix64]]) — for stores that need MinHash
    * signatures WITHOUT DuckDB-oracle parity (the md5/conv base pair
    * above exists because DuckDB can mirror it; the accept loop's
    * artifact is its own oracle). Measured §9.37: the per-seed
    * `xxhash64(concat(shingle, "#s"))` verification family allocated
    * a UTF8String per seed per shingle row and was the near tick's
    * single largest stage; this family is pure long arithmetic fused
    * into whole-stage codegen.
    *
    * h0..h{k-1} are banding components (band exactly like
    * [[signatureTable]]'s via [[bandedIndexFromSignatures]]);
    * v0..v{verK-1} are ESTIMATOR components. Per-seed independence is
    * a REQUIREMENT for the estimator columns (the r14 lesson: the
    * linear seeded family correlates across seeds and estimates J≈0
    * pairs high) — XOR-with-seed + full avalanche has no linear
    * structure, and the quality is MEASURED, not assumed
    * (`probe_mix_estimator`: J≈0 pairs estimate ≈0, near-dup pairs
    * estimate their exact Jaccard, side by side with the concat
    * family).
    */
  def mixedSignatureTableFromShingles(sh: DataFrame, idCol: String,
      k: Int = defaultK, verK: Int = 0): DataFrame = {
    // the two seed streams are gamma*(i+101) (banding) and
    // gamma*(v+1) (estimator): gamma is odd so distinct multipliers
    // give distinct seeds, but the STREAMS overlap the moment
    // v+1 reaches 101 — a verK past 100 would silently correlate
    // estimator components with banding components (exactly the
    // cross-seed correlation the estimator columns exist to avoid)
    require(verK <= 100,
      s"verK=$verK would overlap the banding seed stream (seeds " +
        "gamma*(v+1) meet gamma*(i+101) at v=100) — estimator and " +
        "banding components must come from disjoint seed spaces")
    val gamma = 0x9e3779b97f4a7c15L // SplitMix64's own stream constant
    val base = sh.withColumn("_h3", xxhash64(col("shingle")))
    val aggs = (0 until k).map(i =>
        min(graft.plans.Mix64.column(col("_h3"), gamma * (i + 101)))
          .as(s"h$i")) ++
      (0 until verK).map(v =>
        min(graft.plans.Mix64.column(col("_h3"), gamma * (v + 1)))
          .as(s"v$v"))
    base.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Distinct candidate pairs (idA < idB) that share at least one LSH
    * bucket. One shuffle on (band, bucket); pair expansion is
    * bucket-local (PairGen) so the index computes once.
    */
  def candidatePairs(df: DataFrame, idCol: String, normTextCol: Column,
      n: Int = 5, k: Int = defaultK, bands: Int = defaultBands,
      maxBucket: Int = Int.MaxValue): DataFrame =
    PairGen.pairsWithin(
        // pin the bucket exchange's parallelism (spreadByKey): the
        // band rows are byte-tiny but the in-bucket pair expansion is
        // the query's CPU tail, and AQE's byte-based coalescer folds
        // it into one task otherwise (guide §2.5; d3 isolated
        // 1.89 -> 1.61 s). PairGen's groupBy reuses this exchange.
        graft.operators.SkewTools.spreadByKey(
          bandedIndex(df, idCol, normTextCol, n, k, bands),
          col("band"), col("bucket")),
        Seq("band", "bucket"), col(idCol), maxBucket)
      .select(col("a").as("id_a"), col("b").as("id_b"))
      .distinct()

  /** Incremental probe: candidates between a NEW batch and an
    * EXISTING banded index — the per-increment form of near-dup
    * detection. The index side is the (id, band, bucket) table a
    * production pipeline PERSISTS (b rows per doc, no text); each
    * increment bands only its own documents and equi-joins the stored
    * index on (band, bucket). Old×old pairs are never re-derived and
    * the corpus text is never re-read — cost is O(new batch) + one
    * shuffle of the (tiny) band keys, the same incremental discipline
    * as ExactDedup's fingerprint anti-join (d8).
    *
    * Output: (id_index, id_probe) distinct candidate pairs.
    */
  def probeCandidates(index: DataFrame, probes: DataFrame, idCol: String,
      normTextCol: Column, n: Int = 5, k: Int = defaultK,
      bands: Int = defaultBands): DataFrame =
    probeCandidatesBanded(index,
      bandedIndex(probes, idCol, normTextCol, n, k, bands), idCol)

  /** Probe form for an ALREADY-banded batch — use when the caller has
    * the batch's (id, band, bucket) rows in hand (e.g. it also merges
    * them into the stored index, StreamingLshDedup), so signatures are
    * computed exactly once.
    */
  def probeCandidatesBanded(index: DataFrame, probeBands: DataFrame,
      idCol: String, maxIndexPerBucket: Int = Int.MaxValue): DataFrame = {
    // Candidate volume is Σ_buckets |index∩bucket| × |probe∩bucket| —
    // on duplication-heavy corpora hot buckets make that quadratic
    // (the same law PairGen's maxBucket bounds for the batch path).
    // The cap keeps the `maxIndexPerBucket` SMALLEST index ids per
    // (band, bucket): deterministic truncation, and the kept witnesses
    // are the EARLIEST documents — a probe doc colliding with a hot
    // bucket still surfaces as a duplicate (≥1 witness survives by
    // construction); only the redundant extra witnesses are dropped.
    val capped =
      if (maxIndexPerBucket == Int.MaxValue)
        index.select(col(idCol).as("id_index"), col("band"), col("bucket"))
      else
        index.select(col(idCol).as("id_index"), col("band"), col("bucket"))
          .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("band", "bucket").orderBy("id_index")))
          .filter(col("_rn") <= maxIndexPerBucket)
          .drop("_rn")
    capped
      .join(probeBands.select(col(idCol).as("id_probe"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      // the sides are normally disjoint id sets, but a replayed
      // streaming batch probes an index that already absorbed its own
      // bands — never emit a document as its own duplicate
      .filter(col("id_index") =!= col("id_probe"))
      .select(col("id_index"), col("id_probe"))
      .distinct()
  }

  /** Candidates refined with exact Jaccard ≥ threshold — the full
    * near-dup detector. The shingle sets are recomputed on the (tiny)
    * candidate set rather than carried through the shuffle: at scale,
    * re-reading two rows beats shipping every row's shingle array.
    */
  def nearDuplicates(df: DataFrame, idCol: String, rawTextCol: Column,
      threshold: Double, n: Int = 5, k: Int = defaultK,
      bands: Int = defaultBands): DataFrame = {
    val norm = graft.functions.TextFunctions.normalize(rawTextCol)
    val pairs = candidatePairs(df, idCol, norm, n, k, bands)
    val sets = df.select(col(idCol), Shingles.charShingleSet(norm, n).as("sh"))
    pairs
      .join(sets.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"), Shingles.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
