package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed full-text search: inverted postings + BM25 ranking.
  *
  * The reference's entire reason to push rows into Elasticsearch is to
  * make them text-searchable (reference README.md:4; the ES side holds
  * an analyzed `text` field, tests/testSyncClass.py:441-444). This
  * module supplies the search half natively: the postings table IS the
  * inverted index (built once, persisted like any snapshot, then
  * probed per query), and `bm25` is Lucene's practical scoring
  * function re-expressed as two hash aggregates and a broadcast join.
  *
  * Scale shape (the part that matters at 100 TB):
  *   - `postings` is ONE shuffle keyed by (doc, term) with map-side
  *     combine; it is the index-build cost and amortizes across every
  *     subsequent query, exactly like ES's segment build.
  *   - a query filters the postings to its handful of terms FIRST
  *     (predicate pushed to the parquet scan of a persisted index, so
  *     a term dictionary/row-group stats skip non-matching files),
  *     making everything downstream of the scan proportional to the
  *     matched postings, not the corpus.
  *   - per-term document frequencies and the corpus constants (N,
  *     avgdl) are tiny aggregates broadcast to the scoring join; the
  *     only non-broadcast exchange after the scan is the final
  *     per-doc score aggregate over matched postings.
  *
  * Scoring: idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) (Lucene's
  * non-negative BM25 idf), tf-norm = tf·(k1+1)/(tf + k1·(1 − b +
  * b·dl/avgdl)). All double arithmetic on built-in expressions —
  * codegen'd, no UDFs.
  */
object TextSearch {

  /** Inverted postings: one row per (doc, term) with term frequency
    * and the doc's token length. `norm` must already be normalized
    * (see TextFunctions.normalize); tokenization is whitespace.
    */
  def postings(docs: DataFrame, idCol: String, norm: org.apache.spark.sql.Column): DataFrame = {
    val toks = TextFunctions.tokens(norm)
    docs
      .select(col(idCol), explode(toks).as("term"), size(toks).as("dl"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
  }

  /** BM25 scores for every document matching ≥1 query term.
    *
    * Output: (idCol, n_terms = distinct query terms present, score).
    * Callers wanting ES-style boolean AND semantics filter
    * `n_terms === queryTerms.size`; top-k is an `orderBy(...).limit(k)`
    * (TakeOrdered — no full sort) on the result.
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      norm: org.apache.spark.sql.Column,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val post = postings(docs, idCol, norm)
    bm25OverPostings(post, idCol, queryTerms, k1, b)
  }

  /** Same, over a pre-built (persisted) postings index — the
    * production path: build/maintain the index once, run many queries.
    */
  def bm25OverPostings(
      post: DataFrame,
      idCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      stats: Option[DataFrame] = None): DataFrame = {
    // matched postings: the term filter lands on the index scan
    val matched = post.filter(col("term").isin(queryTerms.distinct: _*))
    score(post, matched, idCol, k1, b, stats)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum("w").as("score"))
  }

  /** Corpus constants (n_docs, avgdl) of an index — one row. Compute
    * this ONCE at index build and persist it next to the postings:
    * deriving it per query re-aggregates the whole index just to get
    * two numbers, which on a large corpus dominates the per-query
    * cost the term-filter pushdown exists to avoid. Pass the persisted
    * row via the `stats` parameter of the scoring entry points.
    */
  def corpusStats(post: DataFrame, idCol: String): DataFrame =
    post.groupBy(col(idCol)).agg(first("dl").as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))

  /** Batch retrieval: score MANY queries in one pass — `queryTerms` is
    * a (query_id, term) DataFrame (distinct terms per query), joined
    * against the index instead of baked into a literal filter. This is
    * the retrieval-mining shape (score thousands of queries against
    * the corpus in one job); the query side broadcasts, so the only
    * large exchange is still the per-(query, doc) score aggregate.
    */
  def bm25Batch(
      post: DataFrame,
      idCol: String,
      queryTerms: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      stats: Option[DataFrame] = None): DataFrame = {
    // self-enforce the distinct-terms-per-query contract: a duplicate
    // (query_id, term) row would otherwise silently inflate n_terms
    // and score; the frame is broadcast-small so the distinct is free
    val qt = queryTerms.distinct()
    val matched = post.join(
      broadcast(qt.select("term").distinct()), "term")
    score(post, matched, idCol, k1, b, stats)
      .join(broadcast(qt), "term")
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum("w").as("score"))
  }

  /** Per-term score-ceiling statistics: (term, df, max_tf, min_dl).
    * df is the exact document frequency; (max_tf, min_dl) bound the
    * BM25 tf-norm from above for EVERY posting of the term (tf-norm
    * is increasing in tf, decreasing in dl), so
    * ub(t) = idf(df)·tfnorm(max_tf, min_dl) is a valid per-term
    * score ceiling under any corpus constants. All three fold
    * additively (sum/max/min), so a persisted index maintains them
    * O(new) per increment and the ceilings never go stale-INVALID —
    * staleness can only loosen them.
    */
  def termBounds(post: DataFrame): DataFrame =
    post.groupBy("term").agg(count(lit(1)).as("df"),
      max("tf").as("max_tf"), min("dl").as("min_dl"))

  /** Top-k batch retrieval: [[bm25Batch]] + per-query rank, ordered
    * by the ROUNDED (4-decimal) score with doc-id tiebreak — the
    * deterministic comparator the oracles use.
    */
  def bm25TopKBatch(
      post: DataFrame,
      idCol: String,
      queryTerms: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      stats: Option[DataFrame] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol))
    bm25Batch(post, idCol, queryTerms, k1, b, stats)
      .select(col("query_id"), col(idCol), col("n_terms"),
        round(col("score"), 4).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** [[bm25TopKBatch]] with MAX-SCORE pruning over a persisted index
    * — bit-identical output, fewer scored postings. The same
    * two-phase bound discipline as
    * [[HashedTfIdf.topKCosinePruned]] (see there for the θ /
    * essential-term / rounding-slack arguments), with the ceilings
    * coming from the STORED `bounds` table
    * ([[TextIndexStore.termBounds]]) instead of a per-run aggregate:
    * a query never touches the postings of a term whose ceiling
    * suffix-sum cannot reach the k-th best score — exactly the
    * frequent (hot-postings) terms, since BM25 idf makes them the
    * low-ceiling ones. Adaptive fallback to the naive single-join
    * plan when the COMPLETION estimate (kept volume × avg
    * postings/doc — candidate docs re-join all their postings) is ≥
    * `fallbackFrac` of the full matched volume; pruning engages in
    * high-θ regimes (duplicate-heavy corpora) where candidates are
    * genuinely few.
    */
  def bm25TopKBatchPruned(
      post: DataFrame,
      idCol: String,
      queryTerms: DataFrame,
      k: Int,
      bounds: DataFrame,
      stats: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      fallbackFrac: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val spark = post.sparkSession
    val qt = queryTerms.distinct()
    // EARLY scan-floor gate — needs no θ: vol_all and the index size
    // come from the ceiling table + the stats row, so a scan-bound
    // fleet (matched ≈ index) skips the whole phase-1 detour. The
    // index size is the TRUE postings row count when the stats row
    // carries it (TextIndexStore.stats does); the n_docs·avgdl proxy
    // counts token occurrences, not distinct (doc, term) rows, and
    // overestimates on high-tf corpora — biasing the gate toward the
    // naive fallback (cost-model skew only; either plan is exact)
    val hasRows = stats.columns.contains("post_rows")
    val cols = Seq(col("avgdl"), col("n_docs")) ++
      (if (hasRows) Seq(col("post_rows")) else Nil)
    val statsRow = stats.select(cols: _*).head
    val avgdl = statsRow.getDouble(0)
    val nDocs = statsRow.getDouble(1)
    val indexRows =
      if (hasRows) statsRow.getDouble(2)
      else nDocs * avgdl
    // avg postings rows per doc — the candidate-completion multiplier
    val avgPerDoc = indexRows / math.max(nDocs, 1.0)
    // The query fleet is DRIVER-SIZED BY CONTRACT (it is broadcast
    // into every retrieval join): the per-(query, term) ceiling
    // ranking, suffix sums, volumes, and essential-term selection run
    // driver-side off ONE fleet-bounded collect of the matched stored
    // bounds — the former window/checkpoint/head-job scaffolding cost
    // more per run than the pruning saved on fallback corpora (the
    // same shape as HashedTfIdf's r9 v22 bench regression).
    // enforced, not assumed: the collect is capped (limit pushes the
    // cap into the plan), and an oversized fleet degrades to the
    // fully distributed batch plan instead of OOMing the driver
    val qtbCollected = qt.join(bounds, "term")
      .select(col("query_id"), col("term"), col("df"),
        col("max_tf"), col("min_dl"))
      .limit(HashedTfIdf.maxGateRows + 1).collect()
    if (qtbCollected.length > HashedTfIdf.maxGateRows)
      return bm25TopKBatch(post, idCol, queryTerms, k, k1, b, Some(stats))
    val qtbRows = qtbCollected
    final case class QT(term: String, df: Long, ubV: Double,
        var sR: Double = 0d)
    val byQuery: Map[Any, Array[QT]] =
      qtbRows.groupBy(_.get(0)).map { case (qid, rows) =>
        val items = rows.map { r =>
          val df = r.getAs[Number]("df").doubleValue()
          val maxTf = r.getAs[Number]("max_tf").doubleValue()
          val minDl = r.getAs[Number]("min_dl").doubleValue()
          val idfB = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
          val ubTf = maxTf * (k1 + 1.0) /
            (maxTf + k1 * ((1.0 - b) + b * minDl / avgdl))
          QT(r.getAs[String]("term"), df.toLong, idfB * ubTf)
        }.sortBy(q => (-q.ubV, q.term))
        var acc = 0d
        items.reverseIterator.foreach { q => acc += q.ubV; q.sR = acc }
        qid -> items
      }
    val volAllV = byQuery.valuesIterator.flatten.map(_.df).sum
    if (volAllV * fallbackFrac < indexRows)
      return bm25TopKBatch(post, idCol, queryTerms, k, k1, b, Some(stats))
    val qidField = qt.schema("query_id")
    val termField = qt.schema("term")
    val dfs = spark.createDataFrame(
      byQuery.valuesIterator.flatten
        .map(q => q.term -> q.df.toDouble).toSeq.distinct
        .map { case (t, d) => Row(t, d) }.asJava,
      StructType(Seq(termField.copy(name = "term"),
        StructField("df", DoubleType))))
    // phase 1: bounded candidates from each query's top-ceiling term,
    // picked by exact per-posting score (stats is one broadcast row)
    val top1 = spark.createDataFrame(
      byQuery.toSeq.collect { case (qid, items) if items.nonEmpty =>
        Row(qid, items.head.term, items.head.df)
      }.asJava,
      StructType(Seq(qidField, termField.copy(name = "term"),
        StructField("df", org.apache.spark.sql.types.LongType))))
    val w1 = log(lit(1.0) + (col("n_docs") - col("df") + 0.5)
      / (col("df") + 0.5)) * (col("tf") * (k1 + 1.0) / (col("tf") +
      lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    // two-level top-(4k), bounding the window sort when the rank-1
    // term's postings list is hot (see HashedTfIdf.topKCosinePruned:
    // per-salt pre-pass then an exact pass over ≤ 64·4k rows/query)
    val bySalt = Window.partitionBy("query_id", "_salt")
      .orderBy(col("w1").desc, col(idCol))
    val byContrib = Window.partitionBy("query_id")
      .orderBy(col("w1").desc, col(idCol))
    val cand1 = post.join(broadcast(top1), "term")
      .crossJoin(broadcast(stats))
      .withColumn("w1", w1)
      .withColumn("_salt", pmod(hash(col(idCol)), lit(64)))
      .withColumn("c_rs", row_number().over(bySalt))
      .where(col("c_rs") <= 4 * k)
      .withColumn("c_rk", row_number().over(byContrib))
      .where(col("c_rk") <= 4 * k)
      .select(col("query_id"), col(idCol))
    val kth = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol))
    val thetaMap: Map[Any, Double] =
      scoreCandidates(post, idCol, qt, cand1, dfs, stats, k1, b)
        .withColumn("rk", row_number().over(kth))
        .where(col("rk") === k)
        .select(col("query_id"), col("score"))
        .collect().map(r => r.get(0) ->
          r.getAs[Number](1).doubleValue()).toMap
    // essential terms under the rounding slack (driver-side);
    // missing θ (query matched < k docs in phase 1) keeps all
    val essentialRows = byQuery.toSeq.flatMap { case (qid, items) =>
      val floor = thetaMap.getOrElse(qid, 0.0) - 2e-4
      items.filter(_.sR >= floor).map(q => (qid, q))
    }
    // completion gate: kept volume × avg postings/doc (candidate
    // docs re-join ALL their postings — §9.18 measured the naive
    // kept-fraction gate mispredicting without this) must undercut
    // the naive matched volume. (Both this and the early scan-floor
    // gate scale with fallbackFrac, so a > 1 value pins the pruned
    // branch for differential testing.)
    val keptVol = essentialRows.map(_._2.df).sum
    if (keptVol * math.max(avgPerDoc, 1.0) >= volAllV * fallbackFrac)
      return bm25TopKBatch(post, idCol, queryTerms, k, k1, b, Some(stats))
    val essential = spark.createDataFrame(
      essentialRows.map { case (qid, q) => Row(qid, q.term) }.asJava,
      StructType(Seq(qidField, termField.copy(name = "term"))))
    val cand = post.join(broadcast(essential), "term")
      .select(col("query_id"), col(idCol)).distinct()
    val scored = scoreCandidates(post, idCol, qt, cand, dfs, stats, k1, b)
    val rankW = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(rankW))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("n_terms"),
        col("score"), col("rank"))
  }

  /** Exact BM25 for the given candidate (query_id, doc) pairs:
    * postings filtered to candidate docs by a broadcast semi-join on
    * the scan (no corpus shuffle), expanded per candidate pair,
    * aggregated with the same idf/tf-norm terms as the naive path —
    * score is ROUNDED to the oracle's 4 decimals.
    */
  private def scoreCandidates(post: DataFrame, idCol: String,
      qt: DataFrame, pairs: DataFrame, dfs: DataFrame,
      stats: DataFrame, k1: Double, b: Double): DataFrame = {
    val candDocs = pairs.select(idCol).distinct()
    val candPost = post.join(broadcast(candDocs), Seq(idCol), "left_semi")
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5)
      / (col("df") + 0.5))
    val tfNorm = col("tf") * (k1 + 1.0) / (col("tf") +
      lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    candPost
      .join(broadcast(qt), "term")
      .join(broadcast(pairs), Seq("query_id", idCol), "left_semi")
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(idf * tfNorm), 4).as("score"))
  }

  /** Positional postings: (id, term, positions) with 0-based,
    * ascending token positions — the index shape phrase and proximity
    * queries need (ES match_phrase). Build cost is the same doc×term
    * shuffle as `postings`, carrying an int array instead of a count.
    */
  def positionalPostings(
      docs: DataFrame,
      idCol: String,
      norm: org.apache.spark.sql.Column): DataFrame =
    docs
      .select(col(idCol), posexplode(TextFunctions.tokens(norm)).as(Seq("pos", "term")))
      .groupBy(col(idCol), col("term"))
      .agg(array_sort(collect_list(col("pos"))).as("positions"))

  /** Exact-phrase match (ES match_phrase): documents containing the
    * words of `phrase` ADJACENT and IN ORDER. Each phrase term's
    * postings slice is filtered at the index scan, the slices
    * equi-join on the doc id, and adjacency folds left-to-right with
    * `array_intersect(positions_so_far + 1, positions_next)` — all
    * codegen'd array expressions, work proportional to the rarest
    * term's postings, never to the corpus. Returns (idCol, n_hits =
    * number of phrase occurrences).
    */
  def phraseMatch(
      positional: DataFrame,
      idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val slices = phrase.zipWithIndex.map { case (t, i) =>
      positional.filter(col("term") === t)
        .select(col(idCol), col("positions").as(s"__p$i"))
    }
    val joined = slices.reduce(_.join(_, idCol))
    // fold: positions where the prefix of length i+1 ends
    val ends = (1 until phrase.size).foldLeft(col("__p0")) { (acc, i) =>
      array_intersect(transform(acc, p => p + 1), col(s"__p$i"))
    }
    joined
      .select(col(idCol), size(ends).cast("long").as("n_hits"))
      .filter(col("n_hits") > 0)
  }

  /** Fuzzy term expansion (ES fuzzy query): vocabulary terms within
    * `maxDist` edits of `term`, with document frequency — what a
    * search layer feeds back into `bm25OverPostings` to tolerate
    * typos. The vocabulary (distinct terms + df) is derived from the
    * postings index with one hash aggregate; the LENGTH BAND
    * `abs(len(t) - len(q)) <= maxDist` prunes before the O(len²)
    * Levenshtein evaluates — at corpus scale the vocabulary is
    * millions of terms and the band (pushable to a persisted,
    * length-sorted vocabulary's zone maps) is what keeps the edit
    * distance off the hot path.
    */
  def fuzzyTerms(
      post: DataFrame,
      term: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    post.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
      .filter(abs(length(col("term")) - lit(term.length)) <= maxDist)
      .withColumn("dist", levenshtein(col("term"), lit(term)))
      .filter(col("dist") <= maxDist)
  }

  /** Per-(posting) BM25 weight `w` over the matched slice; df and the
    * corpus constants come from the FULL index so batch and
    * single-query paths score identically.
    */
  private def score(
      post: DataFrame,
      matched: DataFrame,
      idCol: String,
      k1: Double,
      b: Double,
      statsOpt: Option[DataFrame]): DataFrame = {
    // corpus constants: one tiny two-column row, broadcast — derived
    // here only when the caller didn't pass the persisted row
    val stats = statsOpt.getOrElse(corpusStats(post, idCol))
    // per-term document frequency over the matched slice (small)
    val dfs = matched.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    matched
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"), (idf * tfNorm).as("w"))
  }
}
