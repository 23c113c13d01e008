package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: which held-out/eval documents leak into
  * the training corpus — the n-gram-overlap check (word n-grams,
  * GPT-3/Pile-style) every training-data pipeline runs before a
  * corpus ships.
  *
  * A benchmark document counts a hit for each of its DISTINCT word
  * n-grams that occurs anywhere in the corpus; `contam_ratio` =
  * hits / distinct grams. Exact-duplicate leaks score ~1.0, genuine
  * fresh text scores ~0 once n is large enough that random phrase
  * collisions vanish (n=5 on this corpus; production pipelines use
  * 8-13).
  *
  * Scale shape: both sides explode to (gram) rows and meet in ONE
  * equi-shuffle on the gram; per-doc dedup (`array_distinct`) happens
  * BEFORE the explode so the shuffle carries each (doc, gram) once,
  * and the corpus side collapses to distinct grams map-side. The
  * benchmark side is tiny by construction (eval sets are thousands of
  * docs, the corpus is the 100 TB side) — at full scale, swap the
  * corpus-side distinct for a BloomDedup-style filter over persisted
  * gram fingerprints to skip re-deriving corpus grams per release.
  */
object Decontam {

  /** Array of word n-grams of an already-normalized text column.
    * Documents shorter than n tokens yield NO grams (empty array) —
    * guarded explicitly because `sequence(1, size-n+1)` would DESCEND
    * for short docs, not return empty.
    */
  def wordGrams(norm: Column, n: Int): Column = {
    val toks = split(norm, " ")
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-benchmark-doc contamination report against `corpus`.
    * Output: (idCol, n_grams, n_hit, contam_ratio, is_contaminated).
    *
    * @param hashGrams shuffle 8-byte xxhash64 gram fingerprints
    *                  instead of the gram strings — the 100 TB default
    *                  (a 5-gram string is ~30+ bytes; the corpus side
    *                  dominates the exchange). A 64-bit collision
    *                  inflates n_hit with probability ~n²/2⁶⁵ —
    *                  irrelevant for a contamination REPORT; keep
    *                  strings when per-gram evidence must be exact.
    */
  def report(
      bench: DataFrame,
      corpus: DataFrame,
      idCol: String,
      normCol: Column,
      n: Int,
      hashGrams: Boolean = false): DataFrame = {
    def grams(c: Column): Column = {
      val g = array_distinct(wordGrams(c, n))
      if (hashGrams) transform(g, x => xxhash64(x)) else g
    }
    reportAgainstGrams(bench,
      corpus.select(explode(grams(normCol)).as("gram")),
      idCol, normCol, n, hashGrams)
  }

  /** [[report]] with the corpus side PRE-DERIVED — a (…, gram) table,
    * typically `GramStore`'s persisted per-doc grams (maintained
    * O(new) per corpus increment) instead of a per-check corpus text
    * scan. Rows are deduplicated here, so per-doc-distinct storage is
    * fine.
    */
  def reportAgainstGrams(
      bench: DataFrame,
      corpusGrams: DataFrame,
      idCol: String,
      normCol: Column,
      n: Int,
      hashGrams: Boolean = false): DataFrame = {
    def grams(c: Column): Column = {
      val g = array_distinct(wordGrams(c, n))
      if (hashGrams) transform(g, x => xxhash64(x)) else g
    }
    // totals from the ARRAY, before any explode: a doc shorter than n
    // tokens has zero grams but must still get a report row
    // (n_grams=0, not contaminated) — a plain explode would drop it
    val b = bench.select(col(idCol), grams(normCol).as("__grams"))
    val totals = b.select(col(idCol),
      size(col("__grams")).cast("long").as("n_grams"))
    val bGrams = b.select(col(idCol), explode(col("__grams")).as("gram"))
    val cGrams = corpusGrams.select(col("gram")).distinct()
    val hits = bGrams.join(cGrams, Seq("gram"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit"))
    totals
      .join(hits, Seq(idCol), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("contam_ratio",
        round(col("n_hit") / greatest(col("n_grams"), lit(1)), 4))
      .withColumn("is_contaminated", col("n_hit") > 0)
  }
}
