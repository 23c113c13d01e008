package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.Piece

/** Persisted text-search index over a corpus directory, maintained
  * INCREMENTALLY — the base+delta discipline `StreamingLshDedup`
  * proved for the band index, applied to the postings/positional/stats
  * artifacts (what Elasticsearch's per-document indexing amortizes for
  * the reference, pyCassElastic.py:316-354: ES never re-derives its
  * inverted index from scratch on ingest, and neither does this store).
  *
  * The ledger/reconcile/replay/compaction machinery lives in
  * [[graft.sources.IncrementalDocArtifact]] (shared with
  * `QualityStore`); this object contributes the three pieces:
  *
  *  - `postings` (doc_id, term, tf, dl) and `positional` (doc_id,
  *    term, positions) — per-doc rows, cleanly additive under a pure
  *    file append, clustered by term (`sortWithinPartitions`: the
  *    scalable analogue of term partitioning — a query's pushed term
  *    filter skips non-matching row groups via parquet min/max stats
  *    without a directory per term; compaction re-sorts the fold);
  *  - `statsparts` — ADDITIVE (n_docs, sum_dl) partials per
  *    generation, folded at read: token counts are integers well under
  *    2^53, so the folded avgdl is bit-equal to a whole-corpus average
  *    and persisted-index query results keep hash-matching the
  *    rebuild-inline oracles (t11-t19).
  *
  * A corpus increment costs O(new docs) (§9.11: 8.3 s for a 2% append
  * vs 48 s rebuild at 500 k docs, base files byte-untouched); any
  * non-append change keys a full rebuild — in-place regrowth can never
  * serve stale postings. `SPARK_GRAFT_INDEX_DIR` overrides the store
  * root (defaults under the build's target dir).
  */
object TextIndexStore {

  /** Fold deltas into base once an increment pushes the generation
    * count past this (kept small: each generation adds a file listing
    * and a scan branch to every query until folded). Measured: ~30%
    * serve amplification at 7 live generations for a scan-bound BM25
    * query, fold cost 8.3 s at 500 k docs — SURVEY §9.20.
    */
  val compactEvery = 8

  private def normCol = TextFunctions.normalize(col("text"))

  /** Cluster postings by term so a query's pushed term filter skips
    * row groups; cheap at build time, paid once per increment.
    */
  private def byTerm(df: DataFrame): DataFrame =
    df.repartition(col("term")).sortWithinPartitions("term")

  private def foldBounds(m: DataFrame): DataFrame =
    m.groupBy("term").agg(sum("df").as("df"),
      max("max_tf").as("max_tf"), min("min_dl").as("min_dl"))

  // three pieces (postings, statsparts, termbounds) derive from the
  // SAME (doc, term) aggregation over the build's docs — memoize ONE
  // checkpointed copy per build invocation (keyed on the docs frame
  // the engine hands every builder) so the tokenize + doc×term
  // shuffle runs once per increment, not three times
  private val postMemo =
    new java.util.WeakHashMap[AnyRef, DataFrame]()

  private def postingsOf(docs: DataFrame): DataFrame = {
    val hit = postMemo.synchronized(postMemo.get(docs))
    if (hit != null) hit
    else {
      // computed OUTSIDE the monitor: a concurrent build of another
      // artifact must not serialize behind this one's Spark jobs
      val v = TextSearch.postings(docs, "doc_id", normCol).localCheckpoint()
      postMemo.synchronized {
        val prior = postMemo.get(docs)
        if (prior != null) prior else { postMemo.put(docs, v); v }
      }
    }
  }

  private def handle(corpusPath: String) =
    IncrementalDocArtifact(corpusPath, "inc3", Seq(
      Piece("postings",
        (docs, _) => byTerm(postingsOf(docs)),
        fold = Some(byTerm)),
      Piece("positional",
        (docs, _) => byTerm(TextSearch.positionalPostings(docs, "doc_id", normCol)),
        fold = Some(byTerm)),
      // post_rows is the TRUE postings row count (distinct terms per
      // doc summed): the pruning gates' index-size estimate — avgdl
      // counts token OCCURRENCES, which overestimates postings rows
      // on high-tf corpora and biased the scan-floor gate toward the
      // naive fallback
      Piece("statsparts",
        (docs, _) => {
          val p = postingsOf(docs)
          p.groupBy(col("doc_id")).agg(first("dl").as("dl"))
            .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
            .crossJoin(p.agg(count(lit(1)).as("post_rows")))
        },
        fold = Some(m =>
          m.agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"),
            sum("post_rows").as("post_rows")))),
      // per-term score ceilings (df exact, max_tf/min_dl bounds) —
      // sum/max/min partials fold additively, so increments keep the
      // ceilings valid O(new); see TextSearch.termBounds
      Piece("termbounds",
        (docs, _) => TextSearch.termBounds(postingsOf(docs)),
        fold = Some(foldBounds))),
      merges = Nil,
      compactEvery = compactEvery,
      lazyMerges = false,
      onAdvanceDone = ctx => {
        val f = postMemo.synchronized(postMemo.remove(ctx.newDocs))
        if (f != null) graft.sources.CheckpointUtil.free(f)
      })

  private def serve(spark: SparkSession, sfDir: String, piece: String): DataFrame =
    handle(s"$sfDir/documents.parquet").serve(spark, piece)

  /** Stored (doc_id, term, tf, dl) postings of the `documents` table
    * at `sfDir`; built on first use, advanced incrementally when the
    * corpus grows.
    */
  def postings(spark: SparkSession, sfDir: String): DataFrame =
    serve(spark, sfDir, "postings")

  /** Stored positional postings (doc_id, term, positions). */
  def positional(spark: SparkSession, sfDir: String): DataFrame =
    serve(spark, sfDir, "positional")

  /** Stored one-row corpus constants (n_docs, avgdl, post_rows),
    * folded from the per-generation additive partials — exact
    * (integer sums under 2^53), so identical to a whole-corpus
    * aggregate. `post_rows` is the exact postings row count the
    * pruning gates size the index with.
    */
  def stats(spark: SparkSession, sfDir: String): DataFrame =
    serve(spark, sfDir, "statsparts")
      .agg(sum("n_docs").as("nd"), sum("sum_dl").as("sd"),
        sum("post_rows").as("pr"))
      .select(col("nd").cast("double").as("n_docs"),
        (col("sd").cast("double") / col("nd").cast("double")).as("avgdl"),
        col("pr").cast("double").as("post_rows"))

  /** Stored per-term score ceilings (term, df, max_tf, min_dl),
    * folded from the per-generation partials — the MAX-SCORE pruning
    * table for [[TextSearch.bm25TopKBatchPruned]].
    */
  def termBounds(spark: SparkSession, sfDir: String): DataFrame =
    foldBounds(serve(spark, sfDir, "termbounds"))

  /** Offline compaction hook (also runs automatically on the
    * `compactEvery` cadence).
    */
  def compact(spark: SparkSession, corpusPath: String): Unit =
    handle(corpusPath).compact(spark)
}
