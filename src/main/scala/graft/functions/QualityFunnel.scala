package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4/Gopher-style document-quality funnel (cf. Raffel et al. 2020
  * §2.2's heuristic filters; Rae et al. 2021 appendix A): an ORDERED
  * rule list applied as one fused scan, reporting for every rule how
  * many documents reached it, failed it, and survived it — the
  * removal ledger a training-data pipeline publishes alongside the
  * filtered corpus. The reference has no quality pipeline (it syncs
  * records verbatim, `pyCassElastic.py:54-115`); this is part of the
  * LLM-pipeline extension surface.
  *
  * Funnel semantics: rule i's `dropped` counts documents that PASSED
  * rules 1..i-1 and failed rule i, so the counters sum to exactly
  * (total − survivors) and attribute each removal to the FIRST rule
  * that rejected it — the convention quality-filter ablations use.
  *
  * Scale shape: every rule is a codegen'd Column predicate evaluated
  * in a single projection over one scan; the report is ONE partial
  * (map-side) aggregate folding to a single row, exploded driver-free
  * into per-rule rows. No shuffle of document data, no second scan,
  * no UDFs. Adding rules adds columns, not passes — at 100 TB the
  * funnel costs exactly one corpus read regardless of rule count.
  */
object QualityFunnel {

  /** The default rule ledger over a raw text column. Thresholds are
    * the standard cheap pre-filters (length bounds, language, lexical
    * plausibility, repetition cap), tuned so each stage is live on
    * the synthetic corpus; production pipelines pass their own list.
    */
  def defaultRules(raw: Column): Seq[(String, Column)] = {
    val norm = TextFunctions.normalize(raw)
    val toks = TextFunctions.tokens(norm)
    Seq(
      "min_tokens" -> (size(toks) >= 24),
      "max_tokens" -> (size(toks) <= 88),
      "lang_en" -> (TextFunctions.langId(norm) === "en"),
      "stopword_floor" -> (TextFunctions.stopwordRatio(norm) >= 0.06),
      "repetition_cap" ->
        (round((size(toks) - size(array_distinct(toks))).cast("double")
          / size(toks), 4) <= 0.6))
  }

  /** Per-rule funnel report: (stage, rule, evaluated, dropped,
    * remaining), one row per rule in application order.
    * `evaluated` = survivors of all earlier rules; `remaining` of the
    * last row = the filtered-corpus size [[kept]] would emit.
    */
  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "funnel needs at least one rule")
    // NULL-evaluating predicates (e.g. null text) count as FAILED at
    // the first rule they don't affirmatively pass — without the
    // coalesce such a doc would be dropped at no stage while also
    // failing kept()'s conjunction, breaking the ledger invariant
    // that drops sum to total − survivors
    val flagged = df.select(rules.zipWithIndex.map {
      case ((_, pass), i) => coalesce(pass, lit(false)).as(s"_r$i")
    }: _*)
    // dropped_i = reached rule i (passed 0..i-1) and failed it
    val aggs = count(lit(1)).as("_total") +: rules.indices.map { i =>
      val reachedAndFailed =
        (0 until i).map(j => col(s"_r$j")).foldLeft(!col(s"_r$i"))(_ && _)
      sum(when(reachedAndFailed, 1L).otherwise(0L)).as(s"_d$i")
    }
    val row = flagged.agg(aggs.head, aggs.tail: _*)
    val stages = rules.indices.map { i =>
      val evaluated = (0 until i).map(j => col(s"_d$j"))
        .foldLeft(col("_total"))(_ - _)
      struct(lit((i + 1).toLong).as("stage"), lit(rules(i)._1).as("rule"),
        evaluated.as("evaluated"), col(s"_d$i").as("dropped"),
        (evaluated - col(s"_d$i")).as("remaining"))
    }
    row.select(explode(array(stages: _*)).as("_f")).select(col("_f.*"))
  }

  /** The filtered corpus: documents passing EVERY rule (order is
    * irrelevant here — conjunction — it only shapes the report's
    * attribution). Same single-scan shape; pairs with [[report]] run
    * off one cached projection when both are needed.
    */
  def kept(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.filter(rules.map(_._2).reduce(_ && _))

  /** The funnel ledger as aggregate columns — the `Dataset.observe`
    * form for streaming plans ([[graft.streaming.StreamingPipeline]]):
    * the same first-fail attribution as [[report]], but emitted as
    * per-micro-batch observed metrics in `StreamingQueryProgress`
    * instead of a second aggregation pass. `total` plus one
    * `dropped_<rule>` counter per rule; drops sum to total − survivors
    * (null predicates coalesce to failed, as in [[report]]).
    */
  def ledgerAggs(rules: Seq[(String, Column)]): Seq[Column] = {
    require(rules.nonEmpty, "funnel needs at least one rule")
    val flags = rules.map { case (_, pass) => coalesce(pass, lit(false)) }
    count(lit(1)).as("total") +: rules.indices.map { i =>
      val reachedAndFailed =
        (0 until i).map(flags).foldLeft(!flags(i))(_ && _)
      sum(when(reachedAndFailed, 1L).otherwise(0L))
        .as(s"dropped_${rules(i)._1}")
    }
  }
}
