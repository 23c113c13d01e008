package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-level text operators for training-data preparation: document
  * chunking into overlapping token windows and character-distribution
  * statistics. Like TextFunctions these are pure built-in-expression
  * pipelines (no UDFs): the explode/aggregate shapes stay inside
  * whole-stage codegen and scale with executors, and every arithmetic
  * step is reproducible verbatim in the DuckDB oracle.
  */
object TextOps {

  /** Overlapping token windows — the context-window packing step of a
    * training pipeline. Each document's whitespace tokens are cut into
    * windows of `window` tokens starting every `stride` tokens;
    * the final window may be shorter but no token is ever dropped
    * (offsets run to ceil((n-window)/stride)*stride). Documents with
    * n <= window yield exactly one chunk.
    *
    * Output: (id, chunk_idx, chunk_text, n_tok), one row per window.
    * Deterministic, content-independent chunk ids: (id, chunk_idx) is
    * stable across runs and cluster sizes.
    *
    * Scale: one narrow projection + explode per document — no shuffle
    * at all; downstream consumers group by id only if they need to.
    * Windows overlap by (window - stride) tokens so total output is
    * ~n/stride * window tokens, a fixed expansion factor chosen here,
    * not discovered at runtime.
    */
  def chunkRows(df: DataFrame, idCol: String, rawTextCol: Column,
      window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    require(stride <= window,
      s"stride ($stride) must not exceed window ($window): gaps between " +
        "windows would silently drop the tokens in between")
    val toks = TextFunctions.tokens(TextFunctions.normalize(rawTextCol))
    // last start offset: stride * ceil(max(n-window,0)/stride), as
    // exact integer arithmetic (values are tiny; doubles stay exact)
    val n = size(col("_toks"))
    val maxOff = (floor(
      (greatest(n - window, lit(0)) + (stride - 1)).cast("double") / stride)
      * stride).cast("int")
    df.select(col(idCol), toks.as("_toks"))
      .select(col(idCol), col("_toks"),
        posexplode(sequence(lit(0), maxOff, lit(stride)))
          .as(Seq("chunk_idx", "_off")))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("_toks"), col("_off") + 1, lit(window)), " ")
          .as("chunk_text"),
        size(slice(col("_toks"), col("_off") + 1, lit(window))).as("n_tok"))
  }

  /** Per-document character-distribution stats: Shannon entropy of the
    * normalized text's characters (bits/char, 4 decimals) and the
    * duplicate-token ratio 1 - distinct/total (4 decimals) — two cheap
    * gibberish/repetition signals a corpus filter thresholds on.
    *
    * Entropy uses H = log2(n) - (Σ c·log2 c)/n over per-char counts c
    * — one explode + two hash aggregates, no window. The substring
    * explode (not split-on-empty-regex) sidesteps cross-engine
    * trailing-empty-string semantics.
    */
  def charStats(df: DataFrame, idCol: String, rawTextCol: Column): DataFrame = {
    val norm = TextFunctions.normalize(rawTextCol)
    val toks = TextFunctions.tokens(col("_norm"))
    val perDoc = df.select(col(idCol), norm.as("_norm"))
    val counts = perDoc
      .select(col(idCol),
        explode(sequence(lit(1), greatest(length(col("_norm")), lit(1)))).as("_i"),
        col("_norm"))
      .select(col(idCol), col("_norm").substr(col("_i"), lit(1)).as("_ch"))
      .groupBy(col(idCol), col("_ch")).agg(count(lit(1)).as("_c"))
    val entropy = counts.groupBy(col(idCol))
      .agg(round(
        log2(sum("_c")) -
          sum(col("_c").cast("double") * log2(col("_c"))) / sum("_c"), 4)
        .as("char_entropy"))
    val dup = perDoc.select(col(idCol),
      round(lit(1.0) -
        size(array_distinct(toks)).cast("double") / size(toks), 4)
        .as("dup_tok_ratio"))
    entropy.join(dup, idCol)
  }
}
