package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combine independently-produced ranked
  * lists (BM25 lexical, vector ANN, ...) into one ranking with
  * reciprocal-rank fusion — `score(d) = Σ_lists 1 / (k + rank_d)`
  * (Cormack et al.'s RRF, the standard ES/vector-db hybrid default).
  * RRF fuses RANKS, not raw scores, so the lists need no score
  * calibration against each other — exactly why it is the robust
  * default for lexical+semantic hybrids.
  *
  * Scale shape: the lists union (map-side) into ONE hash aggregate on
  * the id — no join chain, no per-list shuffle; m lists cost the same
  * single exchange as one. Inputs are top-k lists (bounded), so the
  * aggregate is tiny regardless of corpus size. Determinism: ranks are
  * integers, so the fused score is a sum of exact rationals — no
  * float-ordering sensitivity across engines.
  */
object HybridSearch {

  /** Fuse ranked lists, each `(idCol, rank)` with rank 1-based.
    * Output: (idCol, n_lists = lists containing the id, rrf_score).
    */
  def rrfFuse(ranked: Seq[DataFrame], idCol: String, k: Int = 60): DataFrame =
    rrfFuse(ranked, Seq(idCol), k)

  /** Composite-key form — the BATCH fleet shape: lists carry
    * (query_id, doc_id, rank) and fusion groups per (query, doc), so
    * N queries fuse in the SAME single union + hash aggregate as one
    * (per-query fan-out would be N tiny jobs of fixed scheduling
    * cost).
    */
  def rrfFuse(ranked: Seq[DataFrame], idCols: Seq[String], k: Int): DataFrame = {
    require(ranked.nonEmpty, "need at least one ranked list")
    require(k >= 0, "k must be non-negative")
    ranked
      .map(df => df.select(idCols.map(col) :+
        (lit(1.0) / (lit(k) + col("rank"))).as("_c"): _*))
      .reduce(_ unionByName _)
      .groupBy(idCols.map(col): _*)
      .agg(count(lit(1)).as("n_lists"), sum("_c").as("rrf_score"))
  }
}
