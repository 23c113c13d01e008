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

  /** Nearest-cell assignment against a COLLECTED codebook: ONE
    * codegen'd k×d primitive loop per row (plans.NearestCentroid) —
    * no join, no shuffle, expression size O(1) in k, per-row cost
    * exactly the flops. The two composed alternatives both collapse
    * at realistic k (inlined per-cell cosines → janino compile-time
    * blowup past k ≈ 64; HOF zip_with argmax → per-element lambda
    * allocation, ~1 ms/row at k=200×64d). Ties break to the lowest
    * cell id.
    */
  def assignCells(df: DataFrame, embCol: String,
      codebook: Seq[(Int, Seq[Double])], cellCol: String = "_cell"): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(df.sparkSession)
    // sorted by cell id: NearestCentroid keeps the FIRST maximal
    // position on cosine ties == the lowest cell id
    val sorted = codebook.sortBy(_._1)
    df.withColumn(cellCol, call_function("graft_nearest_centroid",
      col(embCol), typedlit(sorted.map(_._2)), typedlit(sorted.map(_._1))))
  }

  /** Collect a (cell, centroid) codebook DataFrame to the driver. */
  def collectCodebook(codebook: DataFrame, cellCol: String): Seq[(Int, Seq[Double])] =
    codebook.select(col(cellCol).cast("int"), col("centroid"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1).toSeq

  /** Lloyd's k-means over the embedding column — a TRAINED coarse
    * quantizer replacing the label stand-in of [[centroids]].
    * Deterministic end to end: seeds are the k lowest-`idCol` vectors,
    * assignment ties break to the lowest cell, and centroid components
    * round to 6 decimals (same reproducibility contract as
    * [[centroids]]).
    *
    * Scale shape: the codebook (k × dims doubles) lives on the driver
    * and broadcasts into a single codegen'd argmax expression — each
    * iteration is ONE distributed pass over the corpus (assignment
    * map-side, means via the usual posexplode aggregate). The driver
    * loop never holds corpus data. Cosine is scale-invariant in the
    * centroid, so using raw means ≈ spherical k-means without the
    * explicit normalization step.
    */
  def trainCodebook(corpus: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    val seeds = corpus.orderBy(col(idCol)).limit(k)
      .select(col(embCol).cast("array<double>"))
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](0).toSeq }.toSeq
    var codebook = seeds
    (0 until iters).foreach { _ =>
      val assigned = assignCells(corpus, embCol, codebook)
      codebook = collectCodebook(centroids(assigned, "_cell", embCol), "_cell")
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    codebook.toDF("cell", "centroid")
  }

  /** Approximate top-k: probe `nprobe` cells per query, exact cosine
    * within them. Output (query_id, neighbor_id, cos, rank).
    *
    * `probeCodebook`: the (cell, centroid) frame queries rank cells
    * by. When absent it is re-derived from the assigned corpus — one
    * full-corpus aggregate per execution. A fleet should pass the
    * PERSISTED codebook instead: for a corpus assigned under an
    * `iters`-step trained codebook, the re-derived centroids are
    * bit-identical to `trainCodebook(iters+1)`'s output (one more
    * Lloyd centroid step over the same assignment), so
    * `CodebookStore.trained(..., iters+1)` serves the same values
    * with zero corpus passes.
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      cellCol: String, embCol: String, k: Int, nprobe: Int,
      probeCodebook: Option[DataFrame] = None): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val codebook = probeCodebook
      .map(_.select(col("cell").as(cellCol), col("centroid")))
      .getOrElse(centroids(corpus, cellCol, embCol))

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
