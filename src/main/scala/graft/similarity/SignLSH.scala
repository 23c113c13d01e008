package graft.similarity

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane (sign) LSH for approximate cosine search.
  *
  * Each table hashes a vector to a small bucket id: bit b = sign of
  * the dot product with a fixed ±1 hyperplane. Collision probability
  * per bit is 1 - θ/π, so multiple independent tables trade compute
  * for recall (`tables` × `bits` plane set).
  *
  * Planes are DETERMINISTIC pseudo-random ±1 matrices derived from a
  * seed, materialized as literal arrays in the plan: no broadcast, no
  * state, bit-identical across engines (the DuckDB oracle inlines the
  * same literals).
  *
  * Scale shape: bucketing is map-side only; the single shuffle keys
  * on (table, bucket) whose cardinality is tables × 2^bits; candidate
  * verification touches only same-bucket pairs. This is the ANN scale
  * path next to BruteForceKnn's exact baseline.
  */
object SignLSH {

  /** [table][bit] → ±1.0 plane of length `dim`; fixed seed = fixed
    * index layout forever (re-bucketing an append-only corpus stays
    * consistent).
    */
  def planes(dim: Int, bits: Int, tables: Int, seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    val rnd = new Random(seed)
    Seq.fill(tables, bits)(Seq.fill(dim)(rnd.nextInt(2) * 2 - 1.0))
  }

  /** Integer bucket id of an embedding under one table's planes. All
    * `bits` hyperplane dots come from ONE native mat-vec loop
    * (`graft_matvec`, bit-identical folds — §9.15 measured the HOF
    * per-plane form paying bits × d interpreted lambda frames per
    * row); the sign/weight combine runs over the tiny rd-array.
    */
  def bucketOf(emb: Column, tablePlanes: Seq[Seq[Double]]): Column = {
    val dots = VectorOps.matVecNative(emb, tablePlanes.flatten)
    tablePlanes.indices.map { b =>
      when(element_at(dots, b + 1) >= 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** (id, table, bucket) index over all tables. */
  def index(df: DataFrame, idCol: String, embCol: String,
      allPlanes: Seq[Seq[Seq[Double]]]): DataFrame = {
    val emb = VectorOps.asDouble(col(embCol))
    val buckets = array(allPlanes.map(tp => bucketOf(emb, tp)): _*)
    // bucketOf evaluates bits x dims multiply-adds per row: fan out
    graft.operators.SkewTools.fanOut(df.select(col(idCol), col(embCol)))
      .select(col(idCol), posexplode(buckets).as(Seq("table", "bucket")))
  }

  /** Distinct candidate pairs (a < b) sharing a bucket in ≥1 table.
    * Pair expansion is bucket-local (PairGen): one shuffle on
    * (table, bucket), index lineage executes once.
    */
  def candidatePairs(df: DataFrame, idCol: String, embCol: String,
      allPlanes: Seq[Seq[Seq[Double]]]): DataFrame =
    graft.dedup.PairGen.pairsWithin(
        index(df, idCol, embCol, allPlanes),
        Seq("table", "bucket"), col(idCol))
      .select(col("a").as("id_a"), col("b").as("id_b"))
      .distinct()

  /** Approximate near-pairs: LSH candidates refined with exact cosine
    * ≥ threshold. Cosine runs only on candidates, via the native
    * single-pass expression over the raw float arrays.
    */
  def annPairs(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, allPlanes: Seq[Seq[Seq[Double]]]): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(df.sparkSession)
    val cands = candidatePairs(df, idCol, embCol, allPlanes)
    val vecs = df.select(col(idCol), col(embCol).as("e"))
    cands
      .join(vecs.select(col(idCol).as("id_a"), col("e").as("e_a")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col("e").as("e_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        VectorOps.cosineNative(col("e_a"), col("e_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Query-directed probe buckets for multi-probe LSH (Lv et al.,
    * VLDB 2007): the query's own bucket plus the `nprobe - 1`
    * perturbations whose total hyperplane margin Σ|⟨q, plane_b⟩| over
    * the flipped bits is SMALLEST — the bit sets most likely to have
    * landed on the wrong side for a true near neighbor. `maxFlips`
    * bounds the perturbation depth: 1 probes the Hamming-1 ball
    * (`bits` candidates), 2 adds the margin-pair-ranked Hamming-2
    * ball (`bits·(bits−1)/2` more) — the extension that keeps recall
    * climbing after single-bit flips saturate (§9.13). Ties between
    * equal margins break to the smaller flip mask, so the probe set
    * is fully deterministic and a SQL oracle reproduces it exactly.
    *
    * Returns an array column of distinct bucket ids (own bucket
    * first); `nprobe` caps at the number of candidates + 1.
    */
  def multiprobeBuckets(emb: Column, tablePlanes: Seq[Seq[Double]],
      nprobe: Int, maxFlips: Int = 1): Column = {
    require(maxFlips == 1 || maxFlips == 2, "maxFlips must be 1 or 2")
    val dotsArr = VectorOps.matVecNative(emb, tablePlanes.flatten)
    val dots = tablePlanes.indices.map(b => element_at(dotsArr, b + 1))
    val bucket = dots.zipWithIndex.map { case (d, b) =>
      when(d >= 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
    val idx = tablePlanes.indices
    // (score, flip-mask) structs sort lexicographically: smallest
    // total margin first, ties to the smaller mask.
    val singles = dots.zipWithIndex.map { case (d, b) =>
      struct(abs(d).as("score"), lit(1 << b).as("mask"))
    }
    val doubles =
      if (maxFlips < 2) Nil
      else for { i <- idx; j <- idx if i < j } yield
        struct((abs(dots(i)) + abs(dots(j))).as("score"),
          lit((1 << i) | (1 << j)).as("mask"))
    val ranked = array_sort(array(singles ++ doubles: _*))
    val flips = slice(ranked, 1,
      math.min(nprobe - 1, singles.size + doubles.size))
    concat(array(bucket),
      transform(flips, f => bucket.bitwiseXOR(f.getField("mask"))))
  }

  /** Multi-probe LSH top-k: one table's recall budget spent on extra
    * PROBES instead of extra TABLES. A classic L-table index costs L×
    * the index memory and L bucketing passes; multi-probe keeps ONE
    * stored bucket per corpus vector and lets each query inspect its
    * `nprobe` most-promising buckets — the standard memory/recall
    * trade for LSH at corpus scale (the index is the big side; queries
    * are cheap).
    *
    * Plan shape: the corpus is bucketed map-side (no shuffle) and
    * joined against the BROADCAST exploded (query, probe-bucket) set —
    * each corpus row has exactly one bucket and a query's probe set is
    * distinct, so no candidate dedup is needed; exact cosine runs on
    * candidates only; the single shuffle is the per-query top-k
    * ranking window keyed on query id.
    */
  def multiprobeTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, nprobe: Int,
      tablePlanes: Seq[Seq[Double]], maxFlips: Int = 1): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val bucketed = corpus.select(col(idCol), col(embCol).as("c_emb"),
      bucketOf(VectorOps.asDouble(col(embCol)), tablePlanes).as("bucket"))
    val probes = queries.select(
        col(idCol).as("query_id"), col(embCol).as("q_emb"),
        explode(multiprobeBuckets(VectorOps.asDouble(col(embCol)),
          tablePlanes, nprobe, maxFlips)).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col(idCol))
    bucketed
      .join(broadcast(probes), Seq("bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        VectorOps.cosineNative(col("q_emb"), col("c_emb")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("cos"), col("rank"))
  }
}
