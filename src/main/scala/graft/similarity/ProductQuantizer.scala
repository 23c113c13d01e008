package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the memory-side scale path for ANN that
  * scalar quantization (v8/v9) can't reach: the d-dim embedding is cut
  * into `m` subvectors, each quantized by its OWN small codebook
  * (trained with the same deterministic Lloyd as the IVF coarse
  * quantizer, `IvfKnn.trainCodebook`), so a vector ships as m small
  * ints — m bytes at k ≤ 256 vs 4d bytes for the float vector (64× for
  * d=64, m=4) — while distances are still computed against the ORIGINAL
  * query via ADC (asymmetric distance computation): per query, a
  * lookup table of dot(q_sub, centroid) for every (subspace, centroid)
  * — m×k dots of d/m flops each, the SAME flops as one full-vector
  * scoring pass — then every corpus vector's approximate inner product
  * is just m table lookups + adds.
  *
  * Spark shape (all built-in expressions, no UDFs):
  *  - training: m independent `trainCodebook` runs over SLICED columns
  *    (driver holds m×k×(d/m) = k×d doubles — same footprint as the
  *    IVF codebook); persisting through `CodebookStore`'s pattern
  *    applies unchanged (build-once, query-many).
  *  - encoding: m codegen'd `graft_nearest_centroid` argmax loops per
  *    row — one narrow projection, no shuffle.
  *  - ADC scan: codes UNPIVOT to (id, subspace, code) — n×m narrow
  *    rows — broadcast-joined to the per-query LUT (q×m×k rows, built
  *    from one tiny cross join) and summed per (query, id): ONE
  *    hash aggregate, map-side partials, nothing quadratic in d. The
  *    approximate score is rounded to 6 decimals (the repo's
  *    cross-engine float discipline) before ranking; ties break by id.
  *  - rescore: top-`coarseK` per query by ADC re-fetch their exact
  *    vectors (candidate-sized join) for the exact cosine top-`k` —
  *    identical discipline to `Quantize.rescoreTopK`.
  *
  * Cosine (not L2) subquantizer assignment: reuses the codegen'd
  * argmax primitive and matches the engine's cosine retrieval metric —
  * the spherical-k-means flavor of PQ. With m=1, k=n, iters=0 the
  * codebook IS the corpus and ADC is the exact inner product; with
  * coarseK ≥ n the rescore is exactly brute force — both pinned in
  * `ProductQuantizerSpec`.
  *
  * Reference scope: PyCassElastic has no vector surface at all; this
  * extends the similarity family the driver mandates (ANN over an
  * embedding column, IVF/LSH-bucketed variants as the scale path).
  */
object ProductQuantizer {

  /** One trained subquantizer: codebook of (cell, centroid) for the
    * subvector range [subspace*subDim, (subspace+1)*subDim).
    */
  final case class SubCodebook(subspace: Int, codebook: Seq[(Int, Seq[Double])])

  private def sliceCol(embCol: String, subspace: Int, subDim: Int) =
    slice(col(embCol), subspace * subDim + 1, subDim)

  /** Train the m subquantizers. Deterministic end to end (seeds = the
    * k lowest-id subvectors, same as the IVF trainer). `iters` Lloyd
    * iterations each; m×iters distributed passes total, each one a
    * map-side argmax + one centroid aggregate.
    */
  def train(corpus: DataFrame, idCol: String, embCol: String,
      m: Int, subDim: Int, k: Int, iters: Int): Seq[SubCodebook] = {
    require(m > 0 && subDim > 0, "m and subDim must be positive")
    // fail loudly on a recipe/dim mismatch: an out-of-range slice is
    // an empty array, which would silently null every code in the
    // trailing subspaces (one first() against the already-driver-side
    // seed path, not a corpus pass)
    val dim = corpus.select(size(col(embCol))).first().getInt(0)
    require(m * subDim == dim,
      s"m * subDim = ${m * subDim} must equal the embedding dim $dim")
    (0 until m).map { s =>
      val sub = corpus.select(col(idCol), sliceCol(embCol, s, subDim).as("_sub"))
      val trained = IvfKnn.trainCodebook(sub, idCol, "_sub", k, iters)
      SubCodebook(s, IvfKnn.collectCodebook(trained, "cell"))
    }
  }

  /** Adds code columns `pq_0 … pq_{m-1}` (int cell per subspace) —
    * m codegen'd argmax expressions riding one projection.
    */
  def encoded(df: DataFrame, embCol: String, subDim: Int,
      books: Seq[SubCodebook]): DataFrame =
    books.foldLeft(df) { (acc, b) =>
      val tmp = s"_sub${b.subspace}"
      IvfKnn.assignCells(
          acc.withColumn(tmp, sliceCol(embCol, b.subspace, subDim)),
          tmp, b.codebook, s"pq_${b.subspace}")
        .drop(tmp)
    }

  /** ADC top-k retrieval: approximate inner-product scan over the
    * codes, exact cosine rescore of the top-`coarseK` candidates.
    * Output (query_id, neighbor_id, cos, rank).
    *
    * `storedCodes`: a pre-encoded (id, pq_0 … pq_{m-1}) frame (e.g.
    * CodebookStore.pqCodes) — the ADC scan then reads codes only
    * (m ints/row) and never touches the corpus floats until the
    * candidate-sized rescore join. Absent, the corpus is encoded
    * inline (one argmax pass).
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, subDim: Int, books: Seq[SubCodebook],
      k: Int, coarseK: Int, storedCodes: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    // codes melted to (id, subspace, cell): n×m narrow rows, one pass
    val m = books.length
    val codes = storedCodes.getOrElse(encoded(corpus, embCol, subDim, books))
      .select(col(idCol) +: books.map(b => col(s"pq_${b.subspace}").as(b.subspace.toString)): _*)
      .unpivot(Array(col(idCol)), books.map(b => col(b.subspace.toString)).toArray,
        "subspace", "cell")
      .withColumn("subspace", col("subspace").cast("int"))

    // per-query LUT: dot(q_sub, centroid) for every (subspace, cell) —
    // q×m×k rows from one tiny cross join, broadcast to the code scan
    val flat = books.flatMap(b => b.codebook.map { case (cell, c) =>
      (b.subspace, cell, c) }).toDF("subspace", "cell", "centroid")
    val qsubs = queries.select(col(idCol).as("query_id"),
        posexplode(array((0 until m).map(s =>
          VectorOps.asDouble(sliceCol(embCol, s, subDim))): _*))
          .as(Seq("subspace", "qsub")))
    val lut = qsubs.join(flat, "subspace")
      .select(col("query_id"), col("subspace"), col("cell"),
        VectorOps.dotNative(col("qsub"), col("centroid")).as("d"))

    // ADC: m lookups + adds per (query, corpus vector); rounded before
    // ranking so the coarse cut is reproducible across engines
    val wCoarse = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col(idCol))
    val cand = codes.join(broadcast(lut), Seq("subspace", "cell"))
      .filter(col(idCol) =!= col("query_id"))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum("d"), 6).as("adc"))
      .withColumn("_crank", row_number().over(wCoarse))
      .filter(col("_crank") <= coarseK)
      .select(col("query_id"), col(idCol).as("neighbor_id"))

    // exact rescore of the candidate set only
    val wFinal = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("_ce")),
        "neighbor_id")
      .join(queries.select(col(idCol).as("query_id"), col(embCol).as("_qe")),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineNative(col("_qe"), col("_ce")).as("cos"))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
  }

  /** Adds `resCol` = embedding − assigned coarse centroid (elementwise,
    * float→double cast BEFORE the subtraction — the engine's precision
    * discipline, re-derivable in DuckDB as `e[i]::DOUBLE - c[i]`).
    * This is the residual the FAISS-proper IVFPQ (`by_residual=true`)
    * quantizes: residuals concentrate near the origin with most of the
    * coarse structure removed, so the SAME m/k code budget spends its
    * resolution on the fine detail — the measured §9.10 ceiling lift.
    * `coarseBook` must be the codebook `cellCol` was assigned under.
    */
  def withResidual(assigned: DataFrame, embCol: String, cellCol: String,
      coarseBook: DataFrame, resCol: String): DataFrame =
    assigned
      .join(broadcast(coarseBook.select(col("cell").as(cellCol),
        col("centroid").as("_cc"))), cellCol)
      .withColumn(resCol,
        zip_with(col(embCol), col("_cc"), (a, b) => a.cast("double") - b))
      .drop("_cc")

  /** Residual IVF+PQ retrieval (the FAISS `by_residual=true` form):
    * codes quantize x − centroid(cell), so the approximate inner
    * product decomposes exactly as ⟨q, centroid(cell)⟩ + ⟨q, r̂⟩ — a
    * per-(query, probed-cell) offset (nprobe rows per query, broadcast)
    * plus the usual m LUT lookups against the RESIDUAL books. Same
    * scan gating and cost shape as [[ivfAdcTopK]]; only the per-row
    * arithmetic gains the offset term. `coarseBook` is both the probe
    * ranking book and the residual anchor (they must match — the
    * decomposition is only exact against the book the codes were
    * encoded under). Output (query_id, neighbor_id, cos, rank).
    */
  def ivfAdcTopKResidual(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, subDim: Int, books: Seq[SubCodebook],
      assignedCodes: DataFrame, cellCol: String, coarseBook: DataFrame,
      k: Int, coarseK: Int, nprobe: Int): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = books.length

    // per-query probe cells WITH the decomposition offset ⟨q, centroid⟩
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val cellRank = Window.partitionBy("query_id")
      .orderBy(VectorOps.cosineNative(col("q_emb"), col("centroid")).desc,
        col(cellCol))
    val probes = q.join(broadcast(
        coarseBook.select(col("cell").as(cellCol), col("centroid"))))
      .withColumn("_cr", row_number().over(cellRank))
      .filter(col("_cr") <= nprobe)
      .select(col("query_id"), col(cellCol),
        VectorOps.dotNative(col("q_emb"), col("centroid")).as("_off"))

    // candidate codes in probed cells, melted per subspace; the cell
    // rides along so the offset joins back after the LUT aggregate
    val candCodes = broadcast(probes.select("query_id", cellCol))
      .join(assignedCodes, cellCol)
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id") +: col(cellCol) +: col(idCol) +:
        books.map(b => col(s"pq_${b.subspace}").as(b.subspace.toString)): _*)
      .unpivot(Array(col("query_id"), col(cellCol), col(idCol)),
        books.map(b => col(b.subspace.toString)).toArray, "subspace", "cell")
      .withColumn("subspace", col("subspace").cast("int"))

    // per-query LUT over the RESIDUAL books
    val flat = books.flatMap(b => b.codebook.map { case (cell, c) =>
      (b.subspace, cell, c) }).toDF("subspace", "cell", "centroid")
    val qsubs = queries.select(col(idCol).as("query_id"),
        posexplode(array((0 until m).map(s =>
          VectorOps.asDouble(sliceCol(embCol, s, subDim))): _*))
          .as(Seq("subspace", "qsub")))
    val lut = qsubs.join(flat, "subspace")
      .select(col("query_id"), col("subspace"), col("cell"),
        VectorOps.dotNative(col("qsub"), col("centroid")).as("d"))

    val wCoarse = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col(idCol))
    val cand = candCodes.join(broadcast(lut),
        Seq("query_id", "subspace", "cell"))
      .groupBy(col("query_id"), col(cellCol), col(idCol))
      .agg(sum("d").as("_rsum"))
      .join(broadcast(probes), Seq("query_id", cellCol))
      .select(col("query_id"), col(idCol),
        round(col("_off") + col("_rsum"), 6).as("adc"))
      .withColumn("_crank", row_number().over(wCoarse))
      .filter(col("_crank") <= coarseK)
      .select(col("query_id"), col(idCol).as("neighbor_id"))

    val wFinal = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("_ce")),
        "neighbor_id")
      .join(queries.select(col(idCol).as("query_id"), col(embCol).as("_qe")),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineNative(col("_qe"), col("_ce")).as("cos"))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
  }

  /** IVF+PQ retrieval (the FAISS IVFPQ shape, no-residual variant —
    * `by_residual=false`): a coarse IVF quantizer gates WHICH code
    * rows each query scores (nprobe cells of the corpus, the same
    * probe discipline as IvfKnn.topK), and PQ codes make each scored
    * row m lookups instead of d flops. Flat ADC pays n×m per query;
    * this pays (nprobe/|cells|)·n×m — the composition that keeps a
    * query fleet sub-linear at corpus scale.
    *
    * `assignedCodes`: (id, cellCol, pq_0 … pq_{m-1}) — the
    * cell-partitioned code layout a production index stores (derive
    * once via IvfKnn.assignCells ∘ encoded, persist like
    * CodebookStore.pqCodes). `probeCodebook`: the (cell, centroid)
    * frame queries rank cells by. Rescore is exact cosine over the
    * candidate set only. Output (query_id, neighbor_id, cos, rank).
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, subDim: Int, books: Seq[SubCodebook],
      assignedCodes: DataFrame, cellCol: String, probeCodebook: DataFrame,
      k: Int, coarseK: Int, nprobe: Int): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = books.length

    // per-query probe cells (tiny cross join, broadcast codebook)
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val cellRank = Window.partitionBy("query_id")
      .orderBy(VectorOps.cosineNative(col("q_emb"), col("centroid")).desc,
        col(cellCol))
    val probes = q.join(broadcast(
        probeCodebook.select(col("cell").as(cellCol), col("centroid"))))
      .withColumn("_cr", row_number().over(cellRank))
      .filter(col("_cr") <= nprobe)
      .select(col("query_id"), col(cellCol))

    // candidate codes: only rows in a probed cell, melted per subspace
    val candCodes = broadcast(probes).join(assignedCodes, cellCol)
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id") +: col(idCol) +:
        books.map(b => col(s"pq_${b.subspace}").as(b.subspace.toString)): _*)
      .unpivot(Array(col("query_id"), col(idCol)),
        books.map(b => col(b.subspace.toString)).toArray, "subspace", "cell")
      .withColumn("subspace", col("subspace").cast("int"))

    // per-query LUT (q×m×k rows), joined per (query, subspace, code)
    val flat = books.flatMap(b => b.codebook.map { case (cell, c) =>
      (b.subspace, cell, c) }).toDF("subspace", "cell", "centroid")
    val qsubs = queries.select(col(idCol).as("query_id"),
        posexplode(array((0 until m).map(s =>
          VectorOps.asDouble(sliceCol(embCol, s, subDim))): _*))
          .as(Seq("subspace", "qsub")))
    val lut = qsubs.join(flat, "subspace")
      .select(col("query_id"), col("subspace"), col("cell"),
        VectorOps.dotNative(col("qsub"), col("centroid")).as("d"))

    val wCoarse = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col(idCol))
    val cand = candCodes.join(broadcast(lut),
        Seq("query_id", "subspace", "cell"))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum("d"), 6).as("adc"))
      .withColumn("_crank", row_number().over(wCoarse))
      .filter(col("_crank") <= coarseK)
      .select(col("query_id"), col(idCol).as("neighbor_id"))

    val wFinal = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("_ce")),
        "neighbor_id")
      .join(queries.select(col(idCol).as("query_id"), col(embCol).as("_qe")),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineNative(col("_qe"), col("_ce")).as("cos"))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
  }
}
