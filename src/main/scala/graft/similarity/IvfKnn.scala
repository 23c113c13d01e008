package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate k-NN — the cell-probing scale path
  * next to SignLSH's hash-bucketing one.
  *
  * Coarse quantizer: one centroid per cell (here: the mean embedding
  * per `cellCol` value — a label column stands in for a trained
  * k-means codebook; the search shape is identical). Components are
  * rounded to 6 decimals so the codebook is reproducible across
  * engines regardless of float summation order.
  *
  * Search: rank cells by query→centroid cosine, probe the top
  * `nprobe`, run EXACT cosine only over members of probed cells.
  *
  * Scale shape (the IVF contract at 100 TB):
  *  - the codebook is tiny (|cells| rows) → broadcast;
  *  - queries are few → broadcast; cell probing is map-side;
  *  - the corpus streams once through a hash join on cell id — the
  *    fraction scanned is nprobe/|cells|, the IVF speedup knob;
  *  - per-query top-k is a ranking window rewritten by Spark to
  *    WindowGroupLimit (bounded per-partition heap, no global sort).
  */
object IvfKnn {

  /** (cellCol, centroid array<double>) — the codebook. */
  def centroids(corpus: DataFrame, cellCol: String, embCol: String): DataFrame =
    corpus
      .select(col(cellCol), posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy(cellCol, "pos")
      .agg(round(avg(col("v").cast("double")), 6).as("m"))
      .groupBy(cellCol)
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("centroid"))

  /** Approximate top-k: probe `nprobe` cells per query, exact cosine
    * within them. Output (query_id, neighbor_id, cos, rank).
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      cellCol: String, embCol: String, k: Int, nprobe: Int): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val codebook = centroids(corpus, cellCol, embCol)

    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val cellRank = Window.partitionBy("query_id")
      .orderBy(VectorOps.cosineNative(col("q_emb"), col("centroid")).desc, col(cellCol))
    val probes = q.join(broadcast(codebook))
      .withColumn("cell_rank", row_number().over(cellRank))
      .filter(col("cell_rank") <= nprobe)
      .select(col("query_id"), col("q_emb"), col(cellCol))

    val members = graft.operators.SkewTools.fanOut(corpus.select(col(cellCol),
      col(idCol).as("neighbor_id"), col(embCol).as("c_emb")))
    val scored = broadcast(probes).join(members, cellCol)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineNative(col("q_emb"), col("c_emb")).as("cos"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
