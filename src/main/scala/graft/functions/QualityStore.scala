package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.ArtifactStore

/** Persisted per-document quality scores — the build-once / query-many
  * discipline (ClusterStore's pattern) applied to t2's composite
  * score: the regex-heavy token/punctuation/stopword scan is a pure
  * deterministic function of the corpus, and every downstream consumer
  * (quality-aware dedup keep, mixture sampling, funnels) re-reads the
  * SAME narrow (doc_id, quality) table instead of re-scanning the full
  * corpus text per query. At 100 TB the scoring pass is a once-per-
  * ingest job over the text; consumers pay a two-column table read —
  * the §9.9 probe measured 34 s of d18's 100× cost as exactly this
  * rescan.
  *
  * Keyed by the corpus content fingerprint (ArtifactStore), so a
  * regrown corpus keys to a fresh build and can never serve stale
  * scores. Determinism: qualityScore is round()ed fixed-point over
  * exact token/char counts — the stored table is bit-identical to an
  * inline scan (asserted in `QualityStoreSpec`), so oracles that
  * recompute quality inline keep hash-matching.
  */
object QualityStore {

  /** Stored (doc_id, quality) over `table`'s `text` at `sfDir`; built
    * and committed on first use.
    */
  def scores(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val h = ArtifactStore.io(s"$sfDir/$table.parquet", "quality_t2")
    if (!h.exists) {
      val d = Tables.load(spark, sfDir, table)
      h.overwrite(d.select(col("doc_id"),
        TextFunctions.qualityScore(col("text"),
          TextFunctions.normalize(col("text"))).as("quality")))
    }
    h.read(spark)
  }
}
