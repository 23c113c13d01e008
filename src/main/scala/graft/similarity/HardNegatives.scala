package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hard-negative mining for contrastive/embedding training: per query,
  * the top-k most-similar corpus vectors whose group label DIFFERS
  * from the query's — near misses, the examples a contrastive loss
  * learns most from (the in-batch-negatives literature's "hard"
  * negatives, mined offline at corpus scale).
  *
  * Same physical shape as IvfKnn.topK — queries rank cells against the
  * (stored) codebook, candidates score only within the probed cells —
  * with the group-mismatch predicate applied BEFORE the ranking
  * window, so the k survivors are the top-k NEGATIVES, not negatives
  * among the top-k. The filter rides the probe join (codegen'd
  * predicate, no extra pass); candidate volume is the same
  * nprobe/|cells| fraction as plain IVF retrieval.
  */
object HardNegatives {

  /** Top-k different-group neighbors per query. `corpus` must carry a
    * cell assignment (`cellCol`, from IvfKnn.assignCells) and the
    * group label. Output (query_id, neighbor_id, cos, rank).
    *
    * `probeCodebook`: (cell, centroid) frame to rank probe cells by —
    * pass the persisted store artifact (see IvfKnn.topK's note on the
    * iters+1 identity); absent, it is re-derived from the corpus.
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      cellCol: String, embCol: String, groupCol: String, k: Int, nprobe: Int,
      probeCodebook: Option[DataFrame] = None): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val codebook = probeCodebook
      .map(_.select(col("cell").as(cellCol), col("centroid")))
      .getOrElse(IvfKnn.centroids(corpus, cellCol, embCol))

    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
      col(groupCol).as("q_grp"))
    val cellRank = Window.partitionBy("query_id")
      .orderBy(VectorOps.cosineNative(col("q_emb"), col("centroid")).desc, col(cellCol))
    val probes = q.join(broadcast(codebook))
      .withColumn("cell_rank", row_number().over(cellRank))
      .filter(col("cell_rank") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("q_grp"), col(cellCol))

    val members = graft.operators.SkewTools.fanOut(corpus.select(col(cellCol),
      col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
      col(groupCol).as("c_grp")))
    // the negative filter rides the probe join — BEFORE the ranking
    // window, so survivors are the top-k negatives
    val scored = broadcast(probes).join(members, cellCol)
      .filter(col("neighbor_id") =!= col("query_id") &&
        !(col("c_grp") <=> col("q_grp")))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineNative(col("q_emb"), col("c_emb")).as("cos"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
