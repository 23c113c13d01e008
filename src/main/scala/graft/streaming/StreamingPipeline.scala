package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{QualityFunnel, TextFunctions}

/** The composed training-data INGESTION pipeline as one streaming
  * plan — the streaming analogue of the batch `p1_pipeline`: documents
  * arrive continuously, and each micro-batch is quality-filtered,
  * exact-deduplicated against everything inside the watermark, and
  * emitted with its token statistics. The reference's closest shape is
  * the periodic sync loop (SyncCassElastic.py:38-47) — here the loop
  * is Structured Streaming's own trigger, and the operators are the
  * engine's batch pieces reused verbatim (same rules, same
  * fingerprint, same stats columns).
  *
  * Composition, Spark-first:
  *  - quality funnel: the rule conjunction is a codegen'd filter on
  *    the stream; the removal LEDGER rides the same pass as
  *    `Dataset.observe` metrics ([[QualityFunnel.ledgerAggs]]) —
  *    per-micro-batch `total` / `dropped_<rule>` counters surface in
  *    `StreamingQueryProgress.observedMetrics` with no second
  *    aggregation, no extra state;
  *  - exact dedup: `dropDuplicatesWithinWatermark` on the content
  *    fingerprint — streaming state is ONE compact md5 key per unique
  *    document and is AGED OUT by the watermark, so state size is
  *    bounded by the dedup horizon, not by stream age (the unbounded
  *    alternative, `dropDuplicates`, would grow state forever —
  *    exactly what a 100 TB/day ingest cannot do);
  *  - token stats: per-row projections (no shuffle) computed once on
  *    the surviving rows only.
  *
  * One shuffle total (the dedup's state-store exchange on fp); the
  * funnel and stats add zero. First-arrival-wins within the horizon:
  * the earliest copy of a document is the one emitted — the same
  * winner convention as the batch `ExactDedup`.
  */
object StreamingPipeline {

  /** The funnel → dedup → stats plan over a streaming `docs` frame.
    *
    * @param docs      streaming DataFrame with `idCol`, `tsCol`
    *                  (event-time timestamp), `textCol`
    * @param rules     ordered quality rules over the raw text column
    *                  (defaults to the engine's C4/Gopher ledger)
    * @param watermark dedup horizon: duplicates arriving within this
    *                  event-time window of the first copy are dropped;
    *                  also bounds the state store
    * @return streaming frame of surviving documents:
    *         (idCol, tsCol, fp, n_tokens, n_chars, quality)
    */
  def apply(docs: DataFrame, idCol: String, tsCol: String, textCol: String,
      rules: Column => Seq[(String, Column)] = QualityFunnel.defaultRules,
      watermark: String = "1 hour"): DataFrame = {
    val rs = rules(col(textCol))
    val norm = TextFunctions.normalize(col(textCol))
    val toks = TextFunctions.tokens(norm)
    val ledger = QualityFunnel.ledgerAggs(rs)
    docs
      .observe("quality_funnel", ledger.head, ledger.tail: _*)
      .filter(rs.map(_._2).reduce(_ && _))
      .withColumn("fp", TextFunctions.fingerprint(norm))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select(col(idCol), col(tsCol), col("fp"),
        size(toks).as("n_tokens"),
        length(norm).as("n_chars"),
        TextFunctions.qualityScore(col(textCol), norm).as("quality"))
  }
}
