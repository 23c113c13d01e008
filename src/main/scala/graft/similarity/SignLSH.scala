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

  /** Integer bucket id of an embedding under one table's planes. */
  def bucketOf(emb: Column, tablePlanes: Seq[Seq[Double]]): Column =
    tablePlanes.zipWithIndex.map { case (plane, b) =>
      when(VectorOps.dotConst(plane, emb) >= 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)

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
}
