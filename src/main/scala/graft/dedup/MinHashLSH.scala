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
  * md5-seeded hashing keeps signatures identical in the DuckDB
  * oracle; production would swap `xxhash64(seed, shingle)`.
  */
object MinHashLSH {

  val defaultK = 8 // signature length
  val defaultBands = 4 // => rows per band r = k / bands

  /** k-element MinHash signature of a shingle-array column: for each
    * seed, the lexicographic min of md5(seed ++ ":" ++ shingle).
    * Column form — for single-array contexts; the table pipeline below
    * uses the aggregate form instead (see class doc).
    */
  def signature(shingles: Column, k: Int = defaultK): Column =
    array((0 until k).map(s =>
      array_min(transform(shingles, x => md5(concat(lit(s + ":"), x))))): _*)

  /** Band digests: b md5s, each over one contiguous r-slice of the
    * signature. Two docs collide in a band iff that slice matches
    * exactly.
    */
  def bandDigests(sig: Column, k: Int = defaultK, bands: Int = defaultBands): Column = {
    val r = k / bands
    array((0 until bands).map(b =>
      md5(concat_ws("|", slice(sig, b * r + 1, r)))): _*)
  }

  /** One (id, shingle) row per overlapping char n-gram. The normalized
    * text is materialized once per document; shingles are substrings
    * over exploded positions — all codegen, no lambda re-evaluation.
    * Texts shorter than n yield one (short) shingle so no document
    * ever has an empty set.
    */
  def shingleRows(df: DataFrame, idCol: String, normTextCol: Column, n: Int = 5): DataFrame =
    df.select(col(idCol), normTextCol.as("_norm"))
      .select(col(idCol), col("_norm"),
        explode(sequence(lit(1), greatest(length(col("_norm")) - (n - 1), lit(1)))).as("_pos"))
      .select(col(idCol), substr(col("_norm"), col("_pos"), lit(n)).as("shingle"))

  /** One row per document with min-hash columns h0..h{k-1}: the
    * signature as a single hash aggregate over exploded shingles.
    */
  def signatureTable(df: DataFrame, idCol: String, normTextCol: Column,
      n: Int = 5, k: Int = defaultK): DataFrame = {
    val aggs = (0 until k).map(s =>
      min(md5(concat(lit(s + ":"), col("shingle")))).as(s"h$s"))
    shingleRows(df, idCol, normTextCol, n)
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** doc_id → (band, bucket) exploded table, the LSH index. */
  def bandedIndex(df: DataFrame, idCol: String, normTextCol: Column,
      n: Int = 5, k: Int = defaultK, bands: Int = defaultBands): DataFrame = {
    val sigArr = array((0 until k).map(i => col(s"h$i")): _*)
    signatureTable(df, idCol, normTextCol, n, k)
      .select(col(idCol),
        posexplode(bandDigests(sigArr, k, bands)).as(Seq("band", "bucket")))
  }

  /** Distinct candidate pairs (idA < idB) that share at least one LSH
    * bucket. One shuffle on (band, bucket); pair expansion is
    * bucket-local (PairGen) so the index computes once.
    */
  def candidatePairs(df: DataFrame, idCol: String, normTextCol: Column,
      n: Int = 5, k: Int = defaultK, bands: Int = defaultBands,
      maxBucket: Int = Int.MaxValue): DataFrame =
    PairGen.pairsWithin(
        bandedIndex(df, idCol, normTextCol, n, k, bands),
        Seq("band", "bucket"), col(idCol), maxBucket)
      .select(col("a").as("id_a"), col("b").as("id_b"))
      .distinct()

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
