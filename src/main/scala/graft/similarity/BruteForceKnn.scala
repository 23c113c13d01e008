package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-k nearest neighbors by cosine — the correctness baseline
  * every approximate method is judged against.
  *
  * Shape: the QUERY side is broadcast (queries are few; the corpus is
  * the big side), the corpus streams through map-side scoring with no
  * shuffle, and per-query top-k runs as a ranking window whose
  * `rank <= k` filter Spark rewrites to WindowGroupLimit — a bounded
  * per-partition heap, not a global sort. At 100 TB the cost is one
  * scan of the corpus per query batch.
  */
object BruteForceKnn {

  /** (query_id, neighbor_id, cosine, rank) for each query row against
    * every corpus row (self-pairs excluded), rank 1..k by descending
    * cosine with id tie-break.
    */
  def topK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(corpus.sparkSession)
    // raw float arrays straight into the native cosine: the codegen'd
    // loop widens per element exactly like cast(array<float> as
    // array<double>), so results match the HOF form bit-for-bit while
    // skipping the materialized double copies.
    // corpus-side scoring is CPU-bound: fan a one-file corpus out
    val c = graft.operators.SkewTools.fanOut(
      corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb")))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineNative(col("q_emb"), col("c_emb")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Same contract as [[topK]] through a bounded-heap AGGREGATE
    * (plans.TopKAggregator) instead of a ranking window: map tasks
    * reduce to <= k candidates per query before the shuffle, so the
    * exchange carries k rows per (query, partition) instead of every
    * scored row — the form that wins when candidates-per-query is
    * large. Identical deterministic ordering => identical results.
    */
  def topKAgg(corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val c = graft.operators.SkewTools.fanOut(
      corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb")))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineNative(col("q_emb"), col("c_emb")).as("cos"))
    val topk = udaf(new graft.plans.TopKAggregator(k),
      org.apache.spark.sql.Encoders.product[graft.plans.Scored])
    scored
      .groupBy("query_id")
      .agg(topk(col("neighbor_id"), col("cos")).as("_tk"))
      .select(col("query_id"), posexplode(col("_tk")).as(Seq("_pos", "_s")))
      .select(col("query_id"), col("_s.id").as("neighbor_id"),
        col("_s.score").as("cos"), (col("_pos") + 1).cast("int").as("rank"))
  }
}
