package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) decontamination — the vector analogue of
  * the n-gram decontamination pass (dedup.Decontam / d12): retire
  * training documents whose embeddings sit within `minCosine` of ANY
  * benchmark/holdout vector, so evaluation data can't leak into a
  * training set through paraphrase the n-gram pass can't see.
  *
  * Scale shape: both sides are assigned to the SAME trained IVF cells
  * (one codegen'd argmax per row, no shuffle — the coarse quantizer is
  * the one the corpus already has via CodebookStore), and the
  * benchmark side — small by definition — broadcasts, so the check is
  * a map-side join: per corpus row, cosine only against benchmark
  * vectors in ITS cell (|bench|/k on average), never the full set. No
  * shuffle of the corpus at all; the anti-join back is the only
  * exchange, on the id. Exact-duplicate contamination is always
  * caught (identical embeddings share a cell by argmax determinism);
  * a paraphrase split across a cell boundary is the same recall trade
  * keptIvf documents, tightened by more probes or a larger τ margin.
  */
object SemanticDecontam {

  /** Rows of `corpus` that survive: no benchmark vector in the same
    * trained cell matches at ≥ `minCosine`. `codebook` is a
    * (cell, centroid) frame (e.g. CodebookStore.trained).
    */
  def kept(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      codebook: DataFrame): DataFrame = {
    val collected = IvfKnn.collectCodebook(codebook, "cell")
    val ac = IvfKnn.assignCells(corpus, vecCol, collected, "__cell")
      .select(col("__cell"), col(idCol), col(vecCol).as("__cv"))
    val ab = IvfKnn.assignCells(bench, vecCol, collected, "__cell")
      .select(col("__cell"), col(vecCol).as("__bv"))
    val contaminated = ac.join(broadcast(ab), Seq("__cell"))
      .filter(VectorOps.cosineNative(col("__cv"), col("__bv")) >= minCosine)
      .select(col(idCol))
      .distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }
}
