package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Cross-document duplicated-SPAN detection — ExactSubstr-style dedup
  * (cf. "Deduplicating Training Data Makes Language Models Better")
  * approximated at a fixed span length: every overlapping `n`-token
  * span in the corpus is keyed, the globally EARLIEST occurrence
  * (lowest (doc, pos)) keeps it, and every other occurrence is a
  * duplicate. Unlike document-level dedup (d1/d8) or near-dup pairs
  * (d3/d6), this finds verbatim PASSAGES repeated across otherwise
  * distinct documents — boilerplate, quotes, license headers.
  *
  * Two outputs: per-document dup-span STATS ([[spanStats]] — the
  * removal-volume report) and maximal duplicated RUNS ([[dupRuns]] —
  * the region list a cut pass actually consumes).
  *
  * Scale shape: spans explode map-side (zero shuffle), ONE shuffle
  * keys the min-occurrence window on the span, one hash aggregate
  * folds back to documents. Occurrences order through a single long
  * `doc_id * 2^posBits + pos` (ids must be integral, non-negative and
  * under 2^(63-posBits) — 2^43 at the default; docs must stay under
  * 2^posBits tokens — 1 M at the default; hash wider ids into that
  * range first), so the window state is one comparison, not a struct.
  *
  * `hashSpans` (default ON — the d12 discipline) shuffles 8-byte
  * `xxhash64(span)` keys instead of the ~8·wordlen-byte span strings,
  * which dominate the exchange otherwise. The per-doc OUTPUT is
  * identical either way (span keys never surface — only counts and
  * positions), so the string-derived oracle still matches; a 64-bit
  * collision would merge two distinct spans with probability
  * ~spans²/2⁶⁵ — irrelevant for dup stats; pass false when span-level
  * evidence must be exact strings.
  */
object SpanDedup {

  /** Exploded occurrences: (idCol, _pos long, _span key, _occ packed
    * order). The pack is GUARDED: an id ≥ 2^(63-posBits) (or
    * non-integral → null cast) or a pos ≥ 2^posBits would silently
    * overflow and elect the WRONG earliest occurrence — fail the job
    * instead.
    */
  private def occurrences(df: DataFrame, idCol: String, rawTextCol: Column,
      n: Int, posBits: Int, hashSpans: Boolean): DataFrame = {
    require(n > 0, "span length must be positive")
    require(posBits > 0 && posBits < 40, "posBits must be in (0, 40)")
    val toks = TextFunctions.tokens(TextFunctions.normalize(rawTextCol))
    val spanStr = array_join(slice(col("_toks"), col("_pos"), lit(n)), " ")
    df.select(col(idCol), toks.as("_toks"))
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(1),
          greatest(size(col("_toks")) - (n - 1), lit(1)))).as("_pos"))
      .select(col(idCol), col("_pos").cast("long").as("_pos"),
        (if (hashSpans) xxhash64(spanStr) else spanStr).as("_span"),
        when(col(idCol).cast("long").between(0L, (1L << (63 - posBits)) - 1L)
            && col("_pos") < (1L << posBits),
          col(idCol).cast("long") * (1L << posBits) + col("_pos"))
          .otherwise(raise_error(format_string(
            s"SpanDedup: (id, pos) outside packable range for posBits=$posBits: id=%s pos=%s",
            col(idCol).cast("string"), col("_pos").cast("string")))
            .cast("long"))
          .as("_occ"))
  }

  /** (idCol, n_spans, dup_spans, dup_ratio), one row per document;
    * documents shorter than `n` tokens contribute their whole text as
    * one span so every document reports.
    */
  def spanStats(df: DataFrame, idCol: String, rawTextCol: Column,
      n: Int = 8, posBits: Int = 20, hashSpans: Boolean = true): DataFrame =
    occurrences(df, idCol, rawTextCol, n, posBits, hashSpans)
      .withColumn("_keep", min(col("_occ")).over(Window.partitionBy("_span")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("_occ") =!= col("_keep"), 1L).otherwise(0L)).as("dup_spans"))
      .withColumn("dup_ratio",
        round(col("dup_spans").cast("double") / col("n_spans"), 4))

  /** Maximal duplicated RUNS per document — the actual ExactSubstr
    * output a cut pass consumes (Lee et al.: remove each maximal
    * duplicated substring, not fixed-width samples of it). Adjacent
    * duplicated `n`-spans overlap by construction, so a run of
    * consecutive dup span STARTS [a..b] is one maximal duplicated
    * token region [a, b+n-1]; merging is the classic gaps-and-islands
    * window (island id = pos − row_number over pos), NOT another
    * corpus-wide pass.
    *
    * Output: one row per (doc, run) — (idCol, run_start, run_end,
    * run_tokens = run_end − run_start + n, n_spans), positions
    * 1-based token indices. Scale shape: the span-keyed shuffle of
    * [[spanStats]] plus ONE doc-keyed window over the DUP spans only
    * (bounded by duplicate volume, not corpus size).
    */
  /** The CUT pass — the final step of the ExactSubstr chain: emit
    * each document's normalized text with every duplicated run
    * ([[dupRuns]]) removed. The globally earliest occurrence of each
    * span survives (runs only list non-earliest occurrences), so the
    * corpus keeps exactly one copy of every repeated passage.
    *
    * Output: (idCol, text_dedup, n_tokens, cut_tokens), one row per
    * document (docs with no dup runs pass through verbatim in
    * normalized form).
    *
    * Scale shape: [[dupRuns]]' one span-keyed shuffle + one doc-keyed
    * aggregate over DUP runs only (bounded by duplicate volume), then
    * ONE doc-keyed equi-join back onto the corpus — the rebuild
    * itself is map-side (higher-order filter over the token array
    * against the doc's own run list; O(tokens × runs-per-doc), no
    * token-level shuffle, no UDF).
    */
  def cutText(df: DataFrame, idCol: String, rawTextCol: Column,
      n: Int = 8, posBits: Int = 20, hashSpans: Boolean = true): DataFrame = {
    val runs = dupRuns(df, idCol, rawTextCol, n, posBits, hashSpans)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("run_start").as("rs"),
        (col("run_end") + (n - 1)).as("re"))).as("_runs"))
    val toks = TextFunctions.tokens(TextFunctions.normalize(rawTextCol))
    val kept = when(col("_runs").isNull, col("_toks"))
      .otherwise(filter(col("_toks"), (_, i) =>
        !exists(col("_runs"), r => i + 1 >= r("rs") && i + 1 <= r("re"))))
    df.select(col(idCol), toks.as("_toks"))
      .join(runs, Seq(idCol), "left")
      .select(col(idCol),
        array_join(kept, " ").as("text_dedup"),
        size(col("_toks")).cast("long").as("n_tokens"),
        (size(col("_toks")) - size(kept)).cast("long").as("cut_tokens"))
  }

  def dupRuns(df: DataFrame, idCol: String, rawTextCol: Column,
      n: Int = 8, posBits: Int = 20, hashSpans: Boolean = true): DataFrame = {
    val dups = occurrences(df, idCol, rawTextCol, n, posBits, hashSpans)
      .withColumn("_keep", min(col("_occ")).over(Window.partitionBy("_span")))
      .filter(col("_occ") =!= col("_keep"))
    val byDoc = Window.partitionBy(idCol).orderBy("_pos")
    dups
      .withColumn("_isl", col("_pos") - row_number().over(byDoc))
      .groupBy(col(idCol), col("_isl"))
      .agg(min("_pos").as("run_start"), max("_pos").as("run_end"),
        count(lit(1)).as("n_spans"))
      .withColumn("run_tokens", col("run_end") - col("run_start") + n)
      .select(col(idCol), col("run_start"), col("run_end"),
        col("run_tokens"), col("n_spans"))
  }
}
