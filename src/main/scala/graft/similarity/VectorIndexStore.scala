package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.{AdvanceCtx, Piece}

/** Persisted IVFPQ index over a vector corpus directory, maintained
  * INCREMENTALLY for batch corpus appends — the last derived artifact
  * that still re-encoded the world on growth. `StreamingVectorIngest`
  * proved the base+delta shape for streaming micro-batches; this is
  * the same contract for the BATCH path, expressed through the
  * [[graft.sources.IncrementalDocArtifact]] engine's piece classes:
  *
  *  - `coarse` (cell, centroid) and `books` (subspace, cell, centroid)
  *    are PINNED pieces — trained once per full build and deliberately
  *    untouched by appends (the fixed-codebook production contract:
  *    codes stay mutually comparable because every generation encodes
  *    against the same quantizers; drift is handled by an offline
  *    retrain, which here is exactly "any non-append corpus change
  *    keys a full rebuild through the ledger");
  *  - `codes` (id, _cell, pq_0 … pq_{m-1}) is ADDITIVE — encoding is
  *    per-vector given fixed books, so an append encodes ONLY the new
  *    files into a delta generation: increment cost O(new vectors),
  *    base files byte-untouched, retrieval reads base ∪ delta.
  *
  * Plain and residual (`by_residual=true`) layouts both supported; the
  * served codes table is exactly what `ProductQuantizer.ivfAdcTopK` /
  * `ivfAdcTopKResidual` scan. On a static corpus the build is
  * bit-identical to `CodebookStore.ivfpqIndex` (same deterministic
  * training chain over the same rows — asserted in
  * `VectorIndexStoreSpec`), so the v16/v17 oracles transfer.
  */
object VectorIndexStore {

  /** Training + layout recipe (folded into the artifact key: a
    * different recipe is a different artifact).
    */
  final case class Recipe(coarseK: Int, coarseIters: Int,
      m: Int, subDim: Int, k: Int, iters: Int, residual: Boolean = false)

  private def parseBooks(df: DataFrame): Seq[ProductQuantizer.SubCodebook] =
    df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, rows) =>
        ProductQuantizer.SubCodebook(s,
          rows.map(t => t._2 -> t._3).sortBy(_._1).toSeq)
      }

  private def trainBooks(docs: DataFrame, ctx: AdvanceCtx, idCol: String,
      embCol: String, r: Recipe): DataFrame = {
    val trained =
      if (r.residual) {
        val coarse = ctx.stored("coarse")
        val assigned = IvfKnn.assignCells(docs, embCol,
          IvfKnn.collectCodebook(coarse, "cell"), "_cell")
        val withRes = ProductQuantizer.withResidual(
          assigned, embCol, "_cell", coarse, "_res")
        ProductQuantizer.train(withRes, idCol, "_res", r.m, r.subDim, r.k, r.iters)
      } else {
        ProductQuantizer.train(docs, idCol, embCol, r.m, r.subDim, r.k, r.iters)
      }
    val spark = docs.sparkSession
    import spark.implicits._
    trained
      .flatMap(b => b.codebook.map { case (c, cent) => (b.subspace, c, cent) })
      .toDF("subspace", "cell", "centroid")
  }

  private def encode(docs: DataFrame, ctx: AdvanceCtx, idCol: String,
      embCol: String, r: Recipe): DataFrame = {
    val coarse = ctx.stored("coarse")
    val books = parseBooks(ctx.stored("books"))
    val assigned = IvfKnn.assignCells(docs, embCol,
      IvfKnn.collectCodebook(coarse, "cell"), "_cell")
    val (toEncode, srcCol) =
      if (r.residual)
        (ProductQuantizer.withResidual(assigned, embCol, "_cell", coarse, "_res"),
          "_res")
      else (assigned, embCol)
    ProductQuantizer.encoded(toEncode, srcCol, r.subDim, books)
      .select(col(idCol) +: col("_cell") +:
        books.map(b => col(s"pq_${b.subspace}")): _*)
  }

  /** Mean angular quantization error of `docs` under the PINNED books
    * — per-subspace 1 − cos(subvector, chosen centroid), averaged over
    * subspaces, summed as an additive (n_vecs, sum_err) partial. This
    * is the drift signal of the fixed-codebook contract: vectors from
    * the training distribution score the train-time error; a shifted
    * append lands far from every centroid and its error rises.
    */
  private def quantError(docs: DataFrame, ctx: AdvanceCtx, idCol: String,
      embCol: String, r: Recipe): DataFrame = {
    val books = parseBooks(ctx.stored("books"))
    val coarse = ctx.stored("coarse")
    val assigned = IvfKnn.assignCells(docs, embCol,
      IvfKnn.collectCodebook(coarse, "cell"), "_cell")
    val (toEncode, srcCol) =
      if (r.residual)
        (ProductQuantizer.withResidual(assigned, embCol, "_cell", coarse, "_res"),
          "_res")
      else (assigned, embCol)
    val enc = ProductQuantizer.encoded(toEncode, srcCol, r.subDim, books)
    // cell ids may be non-contiguous after empty-cell drops — look the
    // chosen centroid up through a map literal, not by position
    val err = books.map { b =>
      val sorted = b.codebook.sortBy(_._1)
      val cents = map_from_arrays(
        typedlit(sorted.map(_._1)), typedlit(sorted.map(_._2)))
      lit(1.0) - VectorOps.cosineNative(
        slice(col(srcCol), b.subspace * r.subDim + 1, r.subDim),
        element_at(cents, col(s"pq_${b.subspace}")))
    }.reduce(_ + _) / books.size.toDouble
    enc.select(err.as("_err"))
      .agg(count(lit(1)).as("n_vecs"), sum("_err").as("sum_err"))
  }

  private val foldErr: DataFrame => DataFrame =
    _.agg(sum("n_vecs").as("n_vecs"), sum("sum_err").as("sum_err"))

  private def handle(corpusPath: String, idCol: String, embCol: String,
      r: Recipe) =
    IncrementalDocArtifact(corpusPath,
      s"vecidx_${idCol}_${embCol}_c${r.coarseK}_ci${r.coarseIters}" +
        s"_m${r.m}_s${r.subDim}_k${r.k}_i${r.iters}" +
        (if (r.residual) "_res" else ""),
      pieces = Seq(
        Piece("coarse",
          (docs, _) => IvfKnn.trainCodebook(docs, idCol, embCol,
            r.coarseK, r.coarseIters),
          pinned = true),
        Piece("books",
          (docs, ctx) => trainBooks(docs, ctx, idCol, embCol, r),
          pinned = true),
        Piece("codes",
          (docs, ctx) => encode(docs, ctx, idCol, embCol, r)),
        // train-time error, pinned at the rebuild that trained the
        // books — the drift baseline
        Piece("qerr0",
          (docs, ctx) => quantError(docs, ctx, idCol, embCol, r),
          pinned = true),
        // running error partials: the rebuild generation re-measures
        // the training set; each append adds its own partial
        Piece("qerr",
          (docs, ctx) => quantError(docs, ctx, idCol, embCol, r),
          fold = Some(foldErr))),
      compactEvery = 8)

  /** Served (id, _cell, pq_0 …) code index over `table`'s `embCol` at
    * `sfDir`; built on first use, appended vectors encoded O(new) with
    * the pinned books.
    */
  def index(spark: SparkSession, sfDir: String, table: String,
      idCol: String, embCol: String, r: Recipe): DataFrame =
    handle(s"$sfDir/$table.parquet", idCol, embCol, r)
      .serve(spark, "codes")

  /** The pinned (cell, centroid) coarse quantizer. */
  def coarse(spark: SparkSession, sfDir: String, table: String,
      idCol: String, embCol: String, r: Recipe): DataFrame =
    handle(s"$sfDir/$table.parquet", idCol, embCol, r)
      .serve(spark, "coarse")

  /** The pinned PQ subquantizers, parsed for LUT construction. */
  def books(spark: SparkSession, sfDir: String, table: String,
      idCol: String, embCol: String, r: Recipe): Seq[ProductQuantizer.SubCodebook] =
    parseBooks(handle(s"$sfDir/$table.parquet", idCol, embCol, r)
      .serve(spark, "books"))

  /** Codebook-drift report, one row:
    * (train_mean_err, overall_mean_err, new_mean_err, drift_ratio) —
    * mean angular quantization error at train time (the pinned qerr0
    * baseline), over the whole current index, and over the vectors
    * appended SINCE training (overall minus baseline, the sensitive
    * signal a small shifted append would otherwise dilute);
    * drift_ratio = new/train (1.0 when nothing was appended). This is
    * the measurement the pinned-codebook contract was missing: fixed
    * books degrade gradually on a drifting corpus, and nothing
    * observed the degradation.
    */
  def driftReport(spark: SparkSession, sfDir: String, table: String,
      idCol: String, embCol: String, r: Recipe): DataFrame = {
    val h = handle(s"$sfDir/$table.parquet", idCol, embCol, r)
    val base = foldErr(h.serve(spark, "qerr0")).head
    val cur = foldErr(h.serve(spark, "qerr")).head
    val (n0, e0) = (base.getLong(0), base.getDouble(1))
    val (n, e) = (cur.getLong(0), cur.getDouble(1))
    val trainMean = e0 / math.max(n0, 1L)
    val overallMean = e / math.max(n, 1L)
    val newMean =
      if (n > n0) (e - e0) / (n - n0) else trainMean
    import spark.implicits._
    Seq((trainMean, overallMean, newMean,
      if (trainMean > 0) newMean / trainMean else 1.0))
      .toDF("train_mean_err", "overall_mean_err", "new_mean_err",
        "drift_ratio")
  }

  /** Retrain the index (full offline rebuild: fresh coarse + PQ books
    * over the WHOLE current corpus, everything re-encoded) when the
    * appended vectors' mean quantization error exceeds `threshold` ×
    * the train-time error. The rebuild stages every piece behind
    * versioned pointers and commits with the atomic ledger rename, so
    * concurrent readers serve the OLD artifact until the flip.
    * Returns whether a retrain ran.
    */
  def retrainIfDrifted(spark: SparkSession, sfDir: String, table: String,
      idCol: String, embCol: String, r: Recipe,
      threshold: Double = 1.5): Boolean = {
    val drift = driftReport(spark, sfDir, table, idCol, embCol, r)
      .head.getDouble(3)
    val drifted = drift > threshold
    if (drifted)
      handle(s"$sfDir/$table.parquet", idCol, embCol, r).rebuild(spark)
    drifted
  }

  /** Offline compaction hook. */
  def compact(spark: SparkSession, corpusPath: String,
      idCol: String, embCol: String, r: Recipe): Unit =
    handle(corpusPath, idCol, embCol, r).compact(spark)
}
