package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector scalar quantization of float embeddings to 8-bit codes —
  * the 4× memory/IO compression step an ANN index applies before
  * anything ships across the cluster. Every arithmetic step is a
  * built-in expression (codegen'd, no UDFs) and is chosen to be
  * reproducible verbatim in DuckDB SQL:
  *
  *  - codes: q_i = floor((x_i - mn) / scale + 0.5), scale =
  *    (mx - mn)/255, computed entirely in double (float→double casts
  *    are exact); floor (not round) because both engines define floor
  *    identically while round's half-way tie rule differs;
  *  - a constant vector (mx == mn) quantizes to all-zero codes;
  *  - dequantization is mn + q_i·scale; the reconstruction MSE is a
  *    sequential left fold, the same order DuckDB's list_reduce uses.
  *
  * Scale: one narrow projection per row, no shuffle; (mn, scale) ride
  * along as two doubles per vector — the standard asymmetric-scalar
  * scheme where distances against reconstructed vectors need no
  * lookup tables.
  */
object Quantize {

  val levels = 255 // 8-bit code range [0, 255]

  /** Adds quantization columns to `df`:
    * q (array<long> codes), q_mn, q_scale, q_mse (reconstruction
    * mean-squared error). The embedding column itself is untouched.
    */
  def quantized(df: DataFrame, embCol: Column): DataFrame = {
    val out = df
      .withColumn("_d", VectorOps.asDouble(embCol))
      .withColumn("q_mn", array_min(col("_d")))
      .withColumn("q_scale",
        (array_max(col("_d")) - col("q_mn")) / levels.toDouble)
      .withColumn("q",
        transform(col("_d"), x =>
          when(col("q_scale") === 0.0, lit(0L))
            .otherwise(floor((x - col("q_mn")) / col("q_scale") + 0.5))))
    val diff2 = zip_with(col("_d"), col("q"), (x, qq) => {
      val r = x - (col("q_mn") + qq * col("q_scale"))
      r * r
    })
    out
      .withColumn("q_mse",
        aggregate(diff2, lit(0.0), (acc, v) => acc + v)
          / size(col("_d")))
      .drop("_d")
  }

  /** Dequantized (reconstructed) double vector from the columns
    * `quantized` added.
    */
  def dequantized(qCol: Column, mnCol: Column, scaleCol: Column): Column =
    transform(qCol, q => mnCol + q * scaleCol)

  /** Two-stage top-k retrieval over a quantized corpus (the SQ +
    * rescore pattern): full-precision queries score the DEQUANTIZED
    * corpus (asymmetric distance — at scale the corpus ships only
    * int8 codes, 4× less IO), top-`coarseK` survive per query, and
    * only those candidates' exact vectors are re-fetched (a
    * candidate-sized join back to the store) for the exact top-`k`
    * re-rank. With coarseK ≥ |corpus| this is exactly brute force —
    * the property the spec pins.
    *
    * Output: (query_id, neighbor_id, cos, rank).
    */
  def rescoreTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, coarseK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val recon = quantized(corpus, col(embCol))
      .select(col(idCol),
        dequantized(col("q"), col("q_mn"), col("q_scale")).as("_r"))
    val qry = org.apache.spark.sql.functions.broadcast(
      queries.select(col(idCol).as("query_id"),
        VectorOps.asDouble(col(embCol)).as("_qe")))
    val wCoarse = Window.partitionBy("query_id")
      .orderBy(col("_cq").desc, col(idCol))
    val cand = recon.join(qry, col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol), col("_qe"),
        VectorOps.cosine(col("_qe"), col("_r")).as("_cq"))
      .withColumn("_crank", row_number().over(wCoarse))
      .filter(col("_crank") <= coarseK)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("_qe"))
    val wFinal = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(corpus.select(col(idCol).as("neighbor_id"),
        VectorOps.asDouble(col(embCol)).as("_ex")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("_qe"), col("_ex")).as("cos"))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
  }
}
