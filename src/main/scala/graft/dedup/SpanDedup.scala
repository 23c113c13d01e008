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
  * Output per document: span count, duplicate-span count, dup ratio —
  * the removal plan a span-cut pass consumes (cutting is a slice over
  * the kept positions; the plan is the expensive, shuffled part).
  *
  * Scale shape: spans explode map-side (zero shuffle), ONE shuffle
  * keys the min-occurrence window on the span, one hash aggregate
  * folds back to documents. Occurrences order through a single long
  * `doc_id * 2^posBits + pos` (ids must be integral, non-negative and
  * under 2^(63-posBits) — 2^43 at the default; docs must stay under
  * 2^posBits tokens — 1 M at the default; hash wider ids into that
  * range first), so
  * the window state is one comparison, not a struct. At production
  * scale swap the span string for `xxhash64(span)` — same plan,
  * 8-byte shuffle keys (the d12 discipline); strings are kept here so
  * the oracle re-derives them verbatim.
  */
object SpanDedup {

  /** (idCol, n_spans, dup_spans, dup_ratio), one row per document;
    * documents shorter than `n` tokens contribute their whole text as
    * one span so every document reports.
    */
  def spanStats(df: DataFrame, idCol: String, rawTextCol: Column,
      n: Int = 8, posBits: Int = 20): DataFrame = {
    require(n > 0, "span length must be positive")
    require(posBits > 0 && posBits < 40, "posBits must be in (0, 40)")
    val toks = TextFunctions.tokens(TextFunctions.normalize(rawTextCol))
    val spans = df.select(col(idCol), toks.as("_toks"))
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(1),
          greatest(size(col("_toks")) - (n - 1), lit(1)))).as("_pos"))
      .select(col(idCol),
        array_join(slice(col("_toks"), col("_pos"), lit(n)), " ").as("_span"),
        // Guard the pack: an id ≥ 2^(63-posBits) (or non-integral →
        // null cast) or a pos ≥ 2^posBits would silently overflow and
        // elect the WRONG earliest occurrence — fail the job instead.
        when(col(idCol).cast("long").between(0L, (1L << (63 - posBits)) - 1L)
            && col("_pos") < (1L << posBits),
          col(idCol).cast("long") * (1L << posBits) + col("_pos"))
          .otherwise(raise_error(format_string(
            s"SpanDedup: (id, pos) outside packable range for posBits=$posBits: id=%s pos=%s",
            col(idCol).cast("string"), col("_pos").cast("string")))
            .cast("long"))
          .as("_occ"))
    val bySpan = Window.partitionBy("_span")
    spans
      .withColumn("_keep", min(col("_occ")).over(bySpan))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("_occ") =!= col("_keep"), 1L).otherwise(0L)).as("dup_spans"))
      .withColumn("dup_ratio",
        round(col("dup_spans").cast("double") / col("n_spans"), 4))
  }
}
