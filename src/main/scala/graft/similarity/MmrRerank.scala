package graft.similarity

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance diversified re-ranking: from a
  * relevance-ranked candidate pool, greedily pick items maximizing
  * `lambda * relevance - mu * max-similarity-to-already-picked` — the
  * standard redundancy-killing step between retrieval and a training
  * batch / eval set / RAG context (Carbonell & Goldstein 1998).
  *
  * Spark-first shape: the expensive part — scoring the corpus against
  * the query — is the existing distributed brute-force/ANN pass; MMR
  * itself runs over the retrieved POOL (`poolK` rows, constant,
  * corpus-size-independent). Each greedy step is one job over the
  * cached pool (cross join against the <= selectK picked rows, one
  * group-max, one argmax head) — selectK driver rows total, the same
  * driver-bounded contract as the IVF codebook collects. Nothing here
  * grows with the corpus: at 100 TB the pool is still poolK rows.
  *
  * Determinism: relevance and pairwise cosines are the engine's
  * bit-exact native cosine (≡ the oracle's sequential fold);
  * `lambda`/`mu` are passed as explicit literals (never computed as
  * `1 - lambda`, whose floating representation could differ from the
  * oracle's literal); ties break by ascending id at every argmax.
  */
object MmrRerank {

  /** MMR-select `selectK` of the `poolK` nearest corpus vectors to
    * each row of `query`. Returns (rank, vec_id, score) with score
    * rounded to 4 decimals.
    */
  def rerank(corpus: DataFrame, query: DataFrame, idCol: String,
      embCol: String, poolK: Int, selectK: Int,
      lambda: Double, mu: Double): DataFrame = {
    val spark = corpus.sparkSession
    val pool = BruteForceKnn
      .topK(corpus, query, idCol, embCol, poolK)
      .select(col("neighbor_id"), col("cos").as("rel"))
    val cand = corpus
      .select(col(idCol).as("neighbor_id"), col(embCol).as("emb"))
      .join(broadcast(pool), "neighbor_id")
      .cache()
    try {
      var picks = Vector.empty[(Int, Long, Double)]
      (1 to selectK).foreach { r =>
        val remaining = cand.filter(
          !col("neighbor_id").isin(picks.map(_._2): _*))
        val scored =
          if (picks.isEmpty)
            remaining.select(col("neighbor_id"),
              (lit(lambda) * col("rel") - lit(mu) * lit(0.0)).as("score"))
          else {
            val sel = cand.filter(
              col("neighbor_id").isin(picks.map(_._2): _*))
              .select(col("emb").as("s_emb"))
            remaining.crossJoin(broadcast(sel))
              .groupBy(col("neighbor_id"), col("rel"))
              .agg(max(VectorOps.cosineNative(col("emb"), col("s_emb")))
                .as("maxsim"))
              .select(col("neighbor_id"),
                (lit(lambda) * col("rel") - lit(mu) * col("maxsim"))
                  .as("score"))
          }
        val w = scored.orderBy(col("score").desc, col("neighbor_id"))
          .limit(1).head()
        picks :+= ((r, w.getLong(0), w.getDouble(1)))
      }
      val schema = StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false)))
      spark.createDataFrame(
        java.util.Arrays.asList(picks.map(p => Row(p._1, p._2, p._3)): _*),
        schema)
        .select(col("rank"), col("vec_id"), round(col("score"), 4).as("score"))
    } finally { cand.unpersist(); () }
  }
}
