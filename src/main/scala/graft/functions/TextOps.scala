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

  /** Sequence-packing plan — the training-data step that concatenates
    * the corpus token stream in a deterministic document order and
    * cuts it into fixed-`budget` packs (documents may span packs; the
    * cut is positional, GPT-style concat-then-chunk). Output per doc:
    * token count, global start offset, first/last pack, offset inside
    * the first pack, packs spanned.
    *
    * The global running sum is NOT one ordered window (a single
    * partition would serialize the corpus): documents group into
    * `bucketSize`-id coarse buckets, per-bucket totals prefix-sum on a
    * tiny frame (|corpus|/bucketSize rows — the only ordered window),
    * and the per-document cumsum runs partitioned BY bucket. The
    * broadcast join then stitches bucket prefix + within-bucket prefix
    * into the exact global offset: two narrow shuffles, no global
    * sort. `idCol` must be integral — the bucket is id div bucketSize.
    */
  def packPlan(df: DataFrame, idCol: String, rawTextCol: Column,
      budget: Long, bucketSize: Long = 4096L): DataFrame = {
    require(budget > 0 && bucketSize > 0, "budget and bucketSize must be positive")
    import org.apache.spark.sql.expressions.Window
    val perDoc = df.select(col(idCol),
      TextFunctions.tokenCount(TextFunctions.normalize(rawTextCol))
        .cast("long").as("n_tok"),
      expr(s"`$idCol` div ${bucketSize}L").as("_bkt"))
    val bucketPrefix = perDoc.groupBy("_bkt")
      .agg(sum("n_tok").as("_btok"))
      .withColumn("_bprefix", coalesce(sum(col("_btok")).over(
        Window.orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_btok")
    val inBucket = Window.partitionBy("_bkt").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    perDoc.join(broadcast(bucketPrefix), "_bkt")
      .withColumn("start_off",
        col("_bprefix") + coalesce(sum(col("n_tok")).over(inBucket), lit(0L)))
      .select(col(idCol), col("n_tok"), col("start_off"),
        expr(s"start_off div ${budget}L").as("pack_first"),
        expr(s"(start_off + n_tok - 1) div ${budget}L").as("pack_last"),
        (col("start_off") % budget).as("pack_offset"))
      .withColumn("n_packs", col("pack_last") - col("pack_first") + 1)
  }

  /** Per-document duplicated-n-gram ratios — the MassiveText/Gopher
    * repetition filter (t9's dup-token ratio generalized to n-grams):
    * for each n, 1 - distinct_grams/total_grams over the document's
    * overlapping token n-grams. Repetitive boilerplate scores high,
    * natural text near zero. One explode per n (map-side, shuffle-free)
    * into one (doc, n) hash aggregate; documents shorter than n yield
    * their single truncated gram (ratio 0), so every doc reports.
    */
  def repetitionStats(df: DataFrame, idCol: String, rawTextCol: Column,
      ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ > 0), "ns must be positive")
    val toks = TextFunctions.tokens(TextFunctions.normalize(rawTextCol))
    val base = df.select(col(idCol), toks.as("_toks"))
    val perN = ns.map { n =>
      base
        .select(col(idCol), lit(n).as("gram_n"), col("_toks"),
          explode(sequence(lit(1),
            greatest(size(col("_toks")) - (n - 1), lit(1)))).as("_pos"))
        .select(col(idCol), col("gram_n"),
          array_join(slice(col("_toks"), col("_pos"), lit(n)), " ").as("_gram"))
    }.reduce(_ unionByName _)
    perN.groupBy(col(idCol), col("gram_n"))
      .agg(count(lit(1)).as("n_grams"),
        count_distinct(col("_gram")).as("_nd"))
      .select(col(idCol), col("gram_n"), col("n_grams"),
        round(lit(1.0) - col("_nd").cast("double") / col("n_grams"), 4)
          .as("dup_ratio"))
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

  /** Statistical quality signal — the distributable unigram form of
    * CCNet-style perplexity filtering (Wenzek et al. 2020 score docs
    * under a KenLM; the degenerate-but-shuffle-friendly variant scores
    * each document's mean token log-probability under the CORPUS'S OWN
    * unigram distribution). Documents far below the corpus mean are
    * gibberish / boilerplate relative to the collection; far above are
    * stopword soup — the standard "middle of the distribution" keep
    * band.
    *
    * Returns (idCol, n_tokens, mean_logprob), mean_logprob = avg over
    * the doc's tokens of ln(c_t / total), 4 decimals. No smoothing
    * needed: every scored token exists in the corpus it was counted
    * from.
    *
    * Scale shape: one explode feeds BOTH aggregates (token counts =
    * map-side-combined hash agg to |vocab| rows; per-doc mean after a
    * token-keyed join). The frequency side is |vocab|-sized —
    * broadcast-able for natural-language vocabularies; AQE picks the
    * strategy when it isn't. Nothing here is quadratic and the corpus
    * is scanned once.
    */
  def unigramLogProb(df: DataFrame, idCol: String, rawTextCol: Column): DataFrame = {
    val toks = TextFunctions.tokens(TextFunctions.normalize(rawTextCol))
    val tokenRows = df.select(col(idCol), explode(toks).as("_tok"))
    val freq = tokenRows.groupBy("_tok").agg(count(lit(1)).as("_c"))
    val total = freq.agg(sum("_c").cast("double").as("_total"))
    tokenRows
      .join(freq, "_tok")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("_c").cast("double") / col("_total"))), 4)
          .as("mean_logprob"))
  }
}
