package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions
import graft.sources.ArtifactStore

/** Persisted duplicate-cluster labelling — the build-once / query-many
  * discipline (CodebookStore's pattern) applied to cluster resolution:
  * the SimHash → near-pairs → connected-components chain is a pure
  * deterministic function of the corpus, and every downstream pass
  * (keep-one filter, quality-aware keep, cluster stats) re-reads the
  * SAME (doc_id, cluster_id) table instead of re-running the iterative
  * contraction per query. At 100 TB the contraction is a once-per-
  * ingest job; queries pay one narrow table read.
  *
  * Keyed by the corpus content fingerprint plus the chain's parameters
  * (hash width via the SimHash default, Hamming radius), so a regrown
  * corpus or different radius can never serve stale clusters.
  * Determinism: SimHash is hash-exact, near-pair generation is
  * set-valued, and min-label components are order-insensitive — the
  * stored table is bit-identical to an inline run (asserted in
  * `ClusterStoreSpec`).
  */
object ClusterStore {

  /** Stored (doc_id, cluster_id) over `table`'s text at `sfDir`,
    * SimHash near-pairs at Hamming ≤ `maxDist`; built and committed
    * on first use via the alternating star contraction.
    *
    * The key versions the CORPUS and the radius, not the code: like
    * every derived artifact here (postings, codebooks), changing the
    * chain's recipe (SimHash width, normalization) requires clearing
    * the store — keys are data-versioned by design.
    */
  def clusters(spark: SparkSession, sfDir: String, table: String,
      maxDist: Int): DataFrame = {
    val h = ArtifactStore.io(s"$sfDir/$table.parquet",
      s"dupclusters_simhash_h$maxDist")
    if (!h.exists) {
      val d = Tables.load(spark, sfDir, table)
      val sims = SimHash.compute(d, "doc_id", TextFunctions.normalize(col("text")))
      val pairs = SimHash.nearPairs(sims, "doc_id", maxDist)
      h.overwrite(DupClusters.componentsAlternating(d, "doc_id", pairs,
        "id_a", "id_b"))
    }
    h.read(spark)
  }
}
