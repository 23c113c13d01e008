package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dedup.MinHashLSH
import graft.functions.{QualityFunnel, TextFunctions, TextIndexStore, TextOps, TextSearch, TfIdfStore}
import graft.operators.Sampling
import graft.sketch.CountMin

/** Text-analysis queries over the `documents` table — language ID,
  * quality scoring, token counting, fingerprinting (the cheap
  * per-document passes of an LLM data pipeline). Every expression is
  * a built-in Catalyst function; oracles mirror the arithmetic
  * exactly in DuckDB SQL.
  */
object TextQueries {

  /** DuckDB rendering of TextFunctions.normalize (note the 'g' flag —
    * DuckDB's regexp_replace is first-match-only by default, Spark's
    * is global).
    */
  private val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val normCte =
    s"WITH n AS (SELECT doc_id, text, $norm AS norm FROM documents)"

  private def stoplist(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** BM25 inverted-index CTEs (postings + corpus stats) shared by the
    * t11 single-query and t13 batch oracles — one definition so the
    * two verifications can never silently de-synchronize.
    */
  private[graft] val bm25IndexCte =
    s"""$normCte,
       |tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term,
       |               len(string_split(norm, ' ')) AS dl FROM n),
       |post AS (SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
       |         FROM tok GROUP BY doc_id, term),
       |docs AS (SELECT doc_id, any_value(dl) AS dl FROM post GROUP BY doc_id),
       |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM docs)""".stripMargin

  private def stopCountSql(lang: String): String = {
    val words = TextFunctions.stopwords.find(_._1 == lang).get._2
    s"length(list_filter(string_split(norm, ' '), t -> list_contains(${stoplist(words)}, t)))"
  }

  /** Self-contained `qual AS (doc_id, quality)` CTE — the same
    * composite-score arithmetic t2 verifies (rounded sub-ratios, then
    * a rounded blend), packaged for oracles outside this file (d18's
    * quality-aware dedup keep rule).
    */
  private[graft] lazy val qualityCte: String =
    s"""qual AS (
       |  SELECT doc_id,
       |    round(least(n_tok * 1.0 / 50.0, 1.0) * 0.4
       |        + (1.0 - punct_ratio) * 0.3
       |        + least(stop_ratio * 4.0, 1.0) * 0.3, 4) AS quality
       |  FROM (SELECT doc_id,
       |      round(length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
       |            / greatest(length(text), 1), 4) AS punct_ratio,
       |      round(${stopCountSql("en")} * 1.0
       |            / greatest(length(string_split(norm, ' ')), 1), 4) AS stop_ratio,
       |      length(string_split(norm, ' ')) AS n_tok
       |    FROM (SELECT doc_id, text, $norm AS norm FROM documents)))""".stripMargin

  /** Funnel-rule SQL shared by the c6 ledger and the p1 composed
    * pipeline — ONE definition (`c`/`b` CTEs over the `n` norm CTE,
    * plus the five ordered rule predicates), so the funnel c6
    * verifies is provably the same funnel p1 filters by.
    */
  private lazy val (funnelCtes, funnelRules): (String, Seq[String]) = {
    val langs = TextFunctions.stopwords.map(_._1)
    val langCols = langs.map(l => s"${stopCountSql(l)} AS c_$l").mkString(",\n  ")
    val best = langs.map(l => s"c_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l =>
      s"WHEN c_$l > 0 AND c_$l = best THEN '$l'").mkString(" ")
    val ctes =
      s"""c AS (SELECT doc_id, norm, len(string_split(norm, ' ')) AS tok,
         |  len(list_distinct(string_split(norm, ' '))) AS dtok,
         |  $langCols
         |FROM n),
         |b AS (SELECT c.*, $best AS best FROM c)""".stripMargin
    val rules = Seq(
      "tok >= 24",
      "tok <= 88",
      s"(CASE $cases ELSE 'und' END) = 'en'",
      "round(c_en * 1.0 / greatest(tok, 1), 4) >= 0.06",
      "round((tok - dtok) * 1.0 / tok, 4) <= 0.6")
    (ctes, rules)
  }

  val all: Seq[GraftQuery] = Seq(

    // Token statistics: whitespace tokens, BPE-ish subword proxy,
    // mean token length.
    GraftQuery(
      "t1_token_stats",
      s"""$normCte
         |SELECT doc_id,
         |  length(string_split(norm, ' ')) AS n_tok,
         |  length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tok_bpe,
         |  round(list_sum([length(t) for t in string_split(norm, ' ')]) * 1.0
         |        / greatest(length(string_split(norm, ' ')), 1), 4) AS mean_tok_len
         |FROM n ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val nc = TextFunctions.normalize(col("text"))
      d.select(col("doc_id"),
          TextFunctions.tokenCount(nc).as("n_tok"),
          TextFunctions.tokenCountBpe(col("text")).as("n_tok_bpe"),
          TextFunctions.meanTokenLength(nc).as("mean_tok_len"))
        .orderBy("doc_id")
    },

    // Quality scoring: punctuation ratio, stopword ratio, composite
    // score — computed from the ROUNDED sub-ratios in both dialects.
    GraftQuery(
      "t2_quality_score",
      s"""$normCte, r AS (
         |  SELECT doc_id,
         |    round(length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
         |          / greatest(length(text), 1), 4) AS punct_ratio,
         |    round(${stopCountSql("en")} * 1.0
         |          / greatest(length(string_split(norm, ' ')), 1), 4) AS stop_ratio,
         |    length(string_split(norm, ' ')) AS n_tok
         |  FROM n)
         |SELECT doc_id, punct_ratio, stop_ratio,
         |  round(least(n_tok * 1.0 / 50.0, 1.0) * 0.4
         |      + (1.0 - punct_ratio) * 0.3
         |      + least(stop_ratio * 4.0, 1.0) * 0.3, 4) AS quality
         |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val nc = TextFunctions.normalize(col("text"))
      d.select(col("doc_id"),
          TextFunctions.punctRatio(col("text")).as("punct_ratio"),
          TextFunctions.stopwordRatio(nc).as("stop_ratio"),
          TextFunctions.qualityScore(col("text"), nc).as("quality"))
        .orderBy("doc_id")
    },

    // Heuristic language ID: argmax of per-language stopword hits,
    // first-listed language wins ties, 'und' when nothing hits.
    GraftQuery(
      "t3_lang_id", {
        val langs = TextFunctions.stopwords.map(_._1)
        val cols = langs.map(l => s"${stopCountSql(l)} AS c_$l").mkString(",\n  ")
        val best = langs.map(l => s"c_$l").mkString("greatest(", ", ", ")")
        val cases = langs.map(l =>
          s"WHEN c_$l > 0 AND c_$l = best THEN '$l'").mkString("\n  ")
        s"""$normCte, c AS (SELECT doc_id,
           |  $cols
           |FROM n), b AS (SELECT doc_id, c_en, c_es, c_fr, c_de, $best AS best FROM c)
           |SELECT doc_id, CASE
           |  $cases
           |  ELSE 'und' END AS lang_guess
           |FROM b ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      d.select(col("doc_id"),
          TextFunctions.langId(TextFunctions.normalize(col("text"))).as("lang_guess"))
        .orderBy("doc_id")
    },

    // Document fingerprints: whole-text md5 + min-shingle rolling
    // fingerprint (stable under edits away from the minimizing window).
    GraftQuery(
      "t4_fingerprint",
      s"""$normCte
         |SELECT doc_id, md5(norm) AS fp,
         |  list_min([md5(sh) for sh in
         |    [substring(norm, i, 5) for i in generate_series(1, greatest(length(norm) - 4, 1))]])
         |    AS min_shingle_fp
         |FROM n ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val nc = TextFunctions.normalize(col("text"))
      d.select(col("doc_id"),
          TextFunctions.fingerprint(nc).as("fp"),
          TextFunctions.minShingleFingerprint(nc).as("min_shingle_fp"))
        .orderBy("doc_id")
    },

    // Corpus top-20 word bigrams (phrase mining): adjacent-token pairs
    // exploded per doc, counted globally, deterministic tie-break.
    // Single-token docs contribute nothing in both dialects.
    GraftQuery(
      "t5_top_bigrams",
      s"""$normCte,
         |bg AS (
         |  SELECT unnest([a[i] || ' ' || a[i+1]
         |                 for i in generate_series(1, len(a) - 1)]) AS bigram
         |  FROM (SELECT string_split(norm, ' ') AS a FROM n))
         |SELECT bigram, count(*) AS cnt
         |FROM bg GROUP BY bigram
         |ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val toks = TextFunctions.tokens(TextFunctions.normalize(col("text")))
      val bigrams = transform(
        sequence(lit(1), size(col("_toks")) - 1),
        i => concat_ws(" ",
          element_at(col("_toks"), i), element_at(col("_toks"), i + 1)))
      d.select(toks.as("_toks"))
        .filter(size(col("_toks")) >= 2) // sequence(1, 0) would descend
        .select(explode(bigrams).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram")).limit(20)
    },

    // Deterministic train/val/test split — the pipeline op every
    // training corpus needs: bucket by a stable content-independent
    // hash of the KEY (md5 hex nibble → 16 buckets, 12/2/2 split) so
    // membership is reproducible across runs, engines, and cluster
    // sizes — no rand(), no sampleBy, nothing seed- or
    // partitioning-dependent. Adding documents never moves existing
    // ones between splits.
    GraftQuery(
      "t6_det_split",
      """WITH b AS (
        |  SELECT doc_id,
        |    strpos('0123456789abcdef', substr(md5(doc_id::varchar), 1, 1)) - 1 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 12 THEN 'train'
        |            WHEN bucket < 14 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n, min(bucket) AS min_b, max(bucket) AS max_b
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        // hex nibble → 0-15 via position in the hex alphabet (both
        // engines see the same md5 hex text, so buckets agree exactly)
        .select(expr(
          "instr('0123456789abcdef', substr(md5(cast(doc_id AS string)), 1, 1)) - 1")
          .as("bucket"))
        .select(
          when(col("bucket") < 12, "train")
            .when(col("bucket") < 14, "val")
            .otherwise("test").as("split"),
          col("bucket"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          min(col("bucket")).as("min_b"), max(col("bucket")).as("max_b"))
        .orderBy("split")
    },

    // Context-window chunking: overlapping 64-token windows every 48
    // tokens — the packing step that turns documents into
    // training-context rows. The final (shorter) window keeps the
    // tail; (doc_id, chunk_idx) is deterministic and
    // content-independent.
    GraftQuery(
      "t7_chunk_windows", {
        val (w, st) = (64, 48)
        s"""$normCte,
           |tk AS (SELECT doc_id, string_split(norm, ' ') AS a FROM n),
           |off AS (
           |  SELECT doc_id, a,
           |    unnest(generate_series(
           |      0, ((greatest(len(a) - $w, 0) + ${st - 1}) // $st) * $st, $st)) AS o
           |  FROM tk)
           |SELECT doc_id, o // $st AS chunk_idx,
           |  array_to_string(a[o + 1 : o + $w], ' ') AS chunk_text,
           |  len(a[o + 1 : o + $w]) AS n_tok
           |FROM off ORDER BY doc_id, chunk_idx""".stripMargin
      }) { (s, dir) =>
      TextOps.chunkRows(Tables.load(s, dir, "documents"), "doc_id", col("text"),
          window = 64, stride = 48)
        .orderBy("doc_id", "chunk_idx")
    },

    // PII redaction: email / IPv4 / phone / long-number scrubbing with
    // per-rule counts — corpus hygiene before anything trains. The
    // synthetic corpus contains no PII, so the query augments each
    // document with doc_id-derived contact strings (deterministic in
    // both dialects) to make every rule fire; the operator under test
    // is the shared regexp chain in TextFunctions.piiRules.
    GraftQuery(
      "t8_pii_redact", {
        val aug =
          """concat(text, ' contact user', doc_id,
            |  '@mail.example.com or +1 555-',
            |  lpad((doc_id * 7 % 10000)::varchar, 4, '0'),
            |  ' ip 10.0.', doc_id % 256, '.1 acct ', doc_id + 100000)"""
            .stripMargin
        val red = TextFunctions.piiRules.foldLeft("aug") {
          case (acc, (_, p, r)) => s"regexp_replace($acc, '$p', '$r', 'g')"
        }
        val counts = TextFunctions.piiRules.map { case (name, p, _) =>
          s"len(regexp_extract_all(aug, '$p')) AS n_$name"
        }.mkString(",\n  ")
        s"""WITH a AS (SELECT doc_id, $aug AS aug FROM documents)
           |SELECT doc_id,
           |  $counts,
           |  md5($red) AS red_fp
           |FROM a ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id"),
        lit("@mail.example.com or +1 555-"),
        lpad(pmod(col("doc_id") * 7, lit(10000)).cast("string"), 4, "0"),
        lit(" ip 10.0."), pmod(col("doc_id"), lit(256)),
        lit(".1 acct "), col("doc_id") + 100000)
      val countCols = TextFunctions.piiRules.map { case (name, _, _) =>
        TextFunctions.piiCount(col("_aug"), name).as(s"n_$name")
      }
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), aug.as("_aug"))
        .select(col("doc_id") +: countCols :+
          md5(TextFunctions.redactPii(col("_aug"))).as("red_fp"): _*)
        .orderBy("doc_id")
    },

    // Character-distribution stats: Shannon entropy (bits/char) and
    // duplicate-token ratio — cheap gibberish/repetition filters.
    GraftQuery(
      "t9_char_stats",
      s"""$normCte,
         |ch AS (
         |  SELECT doc_id, unnest([substring(norm, i, 1)
         |    for i in generate_series(1, greatest(length(norm), 1))]) AS ch
         |  FROM n),
         |cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
         |ent AS (
         |  SELECT doc_id,
         |    round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS char_entropy
         |  FROM cnt GROUP BY doc_id),
         |dup AS (
         |  SELECT doc_id,
         |    round(1.0 - len(list_distinct(string_split(norm, ' '))) * 1.0
         |          / len(string_split(norm, ' ')), 4) AS dup_tok_ratio
         |  FROM n)
         |SELECT ent.doc_id AS doc_id, char_entropy, dup_tok_ratio
         |FROM ent JOIN dup ON ent.doc_id = dup.doc_id
         |ORDER BY ent.doc_id""".stripMargin) { (s, dir) =>
      TextOps.charStats(Tables.load(s, dir, "documents"), "doc_id", col("text"))
        .orderBy("doc_id")
    },

    // Deterministic stratified sampling: per-language rates (halve
    // 'en', quarter everything else) keyed on a stable hash of doc_id
    // — membership survives re-runs, engine swaps, and cluster
    // resizes. One pass: the sampled flag is an expression, so totals
    // and sampled counts ride the same aggregate.
    GraftQuery(
      "t10_stratified_sample", {
        val thrEn = Sampling.thresholdFor(0.5)
        val thrDef = Sampling.thresholdFor(0.25)
        s"""WITH b AS (
           |  SELECT lang,
           |    ('0x' || substr(md5(doc_id::varchar), 1, 3))::INT AS bucket,
           |    CASE WHEN lang = 'en' THEN $thrEn ELSE $thrDef END AS thr
           |  FROM documents)
           |SELECT lang, count(*) AS n_total,
           |  sum(CASE WHEN bucket < thr THEN 1 ELSE 0 END)::BIGINT AS n_sampled
           |FROM b GROUP BY lang ORDER BY lang""".stripMargin
      }) { (s, dir) =>
      val thr = when(col("lang") === "en", lit(Sampling.thresholdFor(0.5)))
        .otherwise(lit(Sampling.thresholdFor(0.25)))
      Tables.load(s, dir, "documents")
        .select(col("lang"),
          (Sampling.hashBucket(col("doc_id")) < thr).cast("long").as("in_sample"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"), sum("in_sample").as("n_sampled"))
        .orderBy("lang")
    },

    // BM25 full-text search — the reference pushes rows into
    // Elasticsearch precisely to make them searchable; this is the
    // search half natively (TextSearch: inverted postings + Lucene's
    // BM25 idf/tf-norm as two hash aggregates and a broadcast join).
    // n_terms carries boolean-AND semantics (filter n_terms = |q|).
    GraftQuery(
      "t11_bm25_search",
      s"""$bm25IndexCte,
         |m AS (SELECT * FROM post WHERE term IN ('vector', 'window', 'merge')),
         |dft AS (SELECT term, count(*)::DOUBLE AS df FROM m GROUP BY term)
         |SELECT m.doc_id AS doc_id, count(*) AS n_terms,
         |  round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         |      * (m.tf * (1.2 + 1.0)
         |         / (m.tf + 1.2 * (0.25 + 0.75 * m.dl / avgdl)))), 4) AS score
         |FROM m JOIN dft USING (term) CROSS JOIN stats
         |GROUP BY m.doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      TextSearch.bm25(d, "doc_id", TextFunctions.normalize(col("text")),
          Seq("vector", "window", "merge"))
        .select(col("doc_id"), col("n_terms"), round(col("score"), 4).as("score"))
        .orderBy("doc_id")
    },

    // Deterministic weighted sample without replacement (A-ExpJ):
    // priority = -ln(u)/w with u drawn from the key hash and w =
    // n_chars — longer documents proportionally likelier, membership
    // reproducible across runs/engines/cluster sizes. Top-25 smallest
    // priorities win (TakeOrdered, no global sort).
    GraftQuery(
      "t12_weighted_sample",
      s"""WITH p AS (
         |  SELECT doc_id, n_chars,
         |    -ln((('0x' || substr(md5(doc_id::varchar), 1, 3))::INT + 1)
         |        / 4097.0) / n_chars AS priority
         |  FROM documents)
         |SELECT doc_id, n_chars, round(priority, 6) AS priority
         |FROM p ORDER BY priority, doc_id LIMIT 25""".stripMargin) { (s, dir) =>
      Sampling.weightedPriority(
          Tables.load(s, dir, "documents"), "doc_id", col("n_chars"))
        .orderBy("_priority", "doc_id").limit(25)
        .select(col("doc_id"), col("n_chars"),
          round(col("_priority"), 6).as("priority"))
    },

    // Batch BM25 retrieval: five queries (terms drawn from docs 0-4's
    // token positions 1/3/5, deduped) scored against the whole corpus
    // in ONE pass — the (query_id, term) table joins the postings
    // index instead of a literal term filter (TextSearch.bm25Batch,
    // the retrieval-mining shape). df/idf come from the full index,
    // so scores are identical to the single-query path.
    GraftQuery(
      "t13_batch_search",
      s"""$bm25IndexCte,
         |qt AS (SELECT doc_id AS query_id,
         |         unnest(list_distinct([a[1], a[3], a[5]])) AS term
         |       FROM (SELECT doc_id, string_split(norm, ' ') AS a FROM n)
         |       WHERE doc_id < 5),
         |dft AS (SELECT term, count(*)::DOUBLE AS df FROM post
         |        WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term)
         |SELECT q.query_id, p.doc_id, count(*) AS n_terms,
         |  round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         |      * (p.tf * (1.2 + 1.0)
         |         / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / avgdl)))), 4) AS score
         |FROM post p JOIN qt q USING (term) JOIN dft USING (term)
         |CROSS JOIN stats
         |GROUP BY q.query_id, p.doc_id
         |ORDER BY query_id, doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val norm = TextFunctions.normalize(col("text"))
      val toks = TextFunctions.tokens(norm)
      val queries = d.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(array(
            element_at(toks, 1), element_at(toks, 3), element_at(toks, 5))))
            .as("term"))
      // production path: the PERSISTED index + stored corpus stats
      // (TextIndexStore) — the batch scores against stored state, so
      // per-run work is the matched postings, not an index rebuild
      TextSearch.bm25Batch(
          TextIndexStore.postings(s, dir), "doc_id", queries,
          stats = Some(TextIndexStore.stats(s, dir)))
        .select(col("query_id"), col("doc_id"), col("n_terms"),
          round(col("score"), 4).as("score"))
        .orderBy("query_id", "doc_id")
    },

    // Top-k batch BM25 with MAX-SCORE pruning over the persisted
    // index + STORED per-term ceilings (df / max_tf / min_dl fold
    // additively, so increments keep them valid): a query's
    // low-ceiling (frequent, hot-postings) terms never reach the
    // scoring join once the k-th best score is bounded. The oracle
    // is the naive score-everything top-k — oracle equality IS the
    // losslessness proof for the bound math.
    GraftQuery(
      "t31_bm25_topk",
      s"""$bm25IndexCte,
         |qt AS (SELECT doc_id AS query_id,
         |         unnest(list_distinct([a[1], a[3], a[5]])) AS term
         |       FROM (SELECT doc_id, string_split(norm, ' ') AS a FROM n)
         |       WHERE doc_id < 5),
         |dft AS (SELECT term, count(*)::DOUBLE AS df FROM post
         |        WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
         |sc AS (SELECT q.query_id, p.doc_id, count(*) AS n_terms,
         |  round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         |      * (p.tf * (1.2 + 1.0)
         |         / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / avgdl)))), 4) AS score
         |  FROM post p JOIN qt q USING (term) JOIN dft USING (term)
         |  CROSS JOIN stats
         |  GROUP BY q.query_id, p.doc_id)
         |SELECT query_id, doc_id, n_terms, score,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, doc_id) AS rank
         |FROM sc QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val norm = TextFunctions.normalize(col("text"))
      val toks = TextFunctions.tokens(norm)
      val queries = d.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(array(
            element_at(toks, 1), element_at(toks, 3), element_at(toks, 5))))
            .as("term"))
      TextSearch.bm25TopKBatchPruned(
          TextIndexStore.postings(s, dir), "doc_id", queries, k = 10,
          bounds = TextIndexStore.termBounds(s, dir),
          stats = TextIndexStore.stats(s, dir))
        .select(col("query_id"), col("doc_id"), col("n_terms"),
          col("score"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Vocabulary / stopword discovery from the STORED exact document
    // frequencies (TfIdfStore's additive dfparts piece — always
    // current, unlike the pinned feature weights): the top-k most
    // document-frequent tokens without re-tokenizing the corpus. At
    // 100 TB the serve cost is a |vocab|-row artifact scan + TopK;
    // the oracle re-derives df from raw text. Ties break on the
    // token, so row membership is deterministic.
    GraftQuery(
      "t32_stored_df_topk",
      s"""$normCte,
         |tok AS (SELECT DISTINCT doc_id,
         |          unnest(string_split(norm, ' ')) AS tok FROM n),
         |dfreq AS (SELECT tok, count(*) AS df FROM tok GROUP BY tok)
         |SELECT tok, df FROM dfreq
         |ORDER BY df DESC, tok LIMIT 25""".stripMargin) { (s, dir) =>
      TfIdfStore.docFrequencies(s, dir)
        .orderBy(col("df").desc, col("tok"))
        .limit(25)
    },

    // Exact-phrase search (ES match_phrase) over a POSITIONAL inverted
    // index: per-term position arrays equi-join on the doc and
    // adjacency folds with array_intersect(prev+1, next) — work
    // proportional to the rarest term's postings. The oracle counts
    // phrase starts positionally (overlap-safe, unlike a regex scan).
    GraftQuery(
      "t14_phrase_search",
      s"""$normCte,
         |tok AS (SELECT doc_id, string_split(norm, ' ') AS a FROM n)
         |SELECT doc_id,
         |  len([i for i in generate_series(1, len(a) - 2)
         |       if a[i] = 'fast' and a[i+1] = 'table' and a[i+2] = 'scan'])
         |    AS n_hits
         |FROM tok
         |WHERE len([i for i in generate_series(1, len(a) - 2)
         |       if a[i] = 'fast' and a[i+1] = 'table' and a[i+2] = 'scan']) > 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // phrase probes hit the STORED positional index; each term's
      // slice is a pushed predicate on the persisted parquet
      TextSearch.phraseMatch(TextIndexStore.positional(s, dir),
          "doc_id", Seq("fast", "table", "scan"))
        .orderBy("doc_id")
    },

    // Fuzzy term expansion (ES fuzzy query): vocabulary terms within
    // one edit of the typo'd query 'scen', with document frequency —
    // length-banded before the Levenshtein so the edit distance never
    // sees the full vocabulary.
    GraftQuery(
      "t15_fuzzy_terms",
      s"""$normCte,
         |tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM n),
         |voc AS (SELECT term, count(*) AS df
         |        FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term)
         |SELECT term, df, levenshtein(term, 'scen') AS dist
         |FROM voc
         |WHERE abs(length(term) - 4) <= 1 AND levenshtein(term, 'scen') <= 1
         |ORDER BY term""".stripMargin) { (s, dir) =>
      // vocabulary expansion over the STORED postings index
      TextSearch.fuzzyTerms(TextIndexStore.postings(s, dir), "scen", maxDist = 1)
        .orderBy("term")
    },

    // Sequence-packing plan: concat-then-chunk the corpus token stream
    // into 512-token packs in deterministic doc_id order. The engine
    // computes the global offsets WITHOUT a global ordered window
    // (coarse id-buckets + tiny bucket-prefix window + per-bucket
    // cumsum); the oracle states the same numbers as one plain cumsum.
    GraftQuery(
      "t16_sequence_pack",
      s"""$normCte,
         |tk AS (SELECT doc_id, len(string_split(norm, ' '))::BIGINT AS n_tok FROM n),
         |c AS (SELECT doc_id, n_tok,
         |        coalesce(sum(n_tok) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
         |          AS start_off
         |      FROM tk)
         |SELECT doc_id, n_tok, start_off,
         |  (start_off // 512)::BIGINT AS pack_first,
         |  ((start_off + n_tok - 1) // 512)::BIGINT AS pack_last,
         |  (start_off % 512)::BIGINT AS pack_offset,
         |  ((start_off + n_tok - 1) // 512 - start_off // 512 + 1)::BIGINT AS n_packs
         |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextOps.packPlan(Tables.load(s, dir, "documents"), "doc_id", col("text"),
          budget = 512L, bucketSize = 256L)
        .orderBy("doc_id")
    },

    // Intra-document repetition (the MassiveText/Gopher filter): the
    // duplicated-n-gram ratio per document for n = 2 and 3 — t9's
    // unigram dup ratio generalized to the n-gram overlap that
    // actually catches looping/boilerplate text.
    GraftQuery(
      "t17_repetition_stats",
      s"""$normCte,
         |tk AS (SELECT doc_id, string_split(norm, ' ') AS a FROM n),
         |o2 AS (SELECT doc_id, a,
         |         unnest(generate_series(1, greatest(len(a) - 1, 1))) AS p FROM tk),
         |o3 AS (SELECT doc_id, a,
         |         unnest(generate_series(1, greatest(len(a) - 2, 1))) AS p FROM tk),
         |g AS (
         |  SELECT doc_id, 2 AS gram_n, array_to_string(a[p : p + 1], ' ') AS gram
         |  FROM o2
         |  UNION ALL
         |  SELECT doc_id, 3 AS gram_n, array_to_string(a[p : p + 2], ' ') AS gram
         |  FROM o3)
         |SELECT doc_id, gram_n, count(*) AS n_grams,
         |  round(1.0 - count(DISTINCT gram) * 1.0 / count(*), 4) AS dup_ratio
         |FROM g GROUP BY doc_id, gram_n
         |ORDER BY doc_id, gram_n""".stripMargin) { (s, dir) =>
      TextOps.repetitionStats(Tables.load(s, dir, "documents"), "doc_id",
          col("text"), ns = Seq(2, 3))
        .orderBy("doc_id", "gram_n")
    },

    // Count-Min sketch: approximate token frequencies from a bounded
    // (depth × width) additive table — the "novel sketch" surface.
    // Estimates are never undercounts (min over 3 hash rows); at
    // width 512 against a multi-thousand-term vocabulary collisions
    // are real, so the query exposes exact vs estimate side by side
    // (the absent probe term shows pure collision mass). The oracle
    // re-derives every md5-based cell index bit-for-bit.
    GraftQuery(
      "c3_countmin_sketch",
      cmsEstCtes +
        """
          |SELECT term, coalesce(cnt, 0)::BIGINT AS exact_count, cms_count
          |FROM est LEFT JOIN tc USING (term)
          |ORDER BY term""".stripMargin) { (s, dir) =>
      import graft.sketch.SketchStore.{Depth, Width}
      val toks = Tables.load(s, dir, "documents")
        .select(explode(
          TextFunctions.tokens(TextFunctions.normalize(col("text")))).as("term"))
      val sketch = CountMin.build(toks, col("term"), Depth, Width)
      val probeDf = s.createDataFrame(cmsProbes.map(Tuple1.apply)).toDF("term")
      val exact = toks.groupBy("term").agg(count(lit(1)).as("exact_count"))
      CountMin.estimate(sketch, probeDf, "term", Depth, Width)
        .join(exact, Seq("term"), "left")
        .select(col("term"),
          coalesce(col("exact_count"), lit(0L)).as("exact_count"),
          col("cms_count"))
        .orderBy("term")
    },

    // HyperLogLog as a mergeable TABLE: per-source distinct-token
    // counts from 64 registers per source — exact vs estimate side by
    // side. Registers and ranks are integer arithmetic on the shared
    // md5 base; SUM(2^-r) is a sum of exact dyadic rationals, so only
    // the final ln/divide is inexact (rounded to 2 dp in both
    // dialects). The c4 oracle re-derives register, rank, and the
    // small-range correction verbatim.
    GraftQuery(
      "c4_hll_sketch",
      s"""$normCte,
         |tok AS (SELECT d.source, unnest(string_split(n.norm, ' ')) AS term
         |        FROM n JOIN documents d USING (doc_id)),
         |h AS (SELECT source,
         |        ('0x' || substr(md5(term), 1, 15))::BIGINT AS v FROM tok),
         |hr AS (SELECT source, v % 64 AS register,
         |         CASE WHEN v // 64 = 0 THEN 55
         |              ELSE 54 - floor(log2(v // 64))::BIGINT END AS rho
         |       FROM h),
         |sk AS (SELECT source, register, max(rho) AS r
         |       FROM hr GROUP BY source, register),
         |agg AS (SELECT source, sum(power(2.0, -r)) AS z, count(*) AS np
         |        FROM sk GROUP BY source),
         |est AS (SELECT source,
         |          0.709 * 64 * 64 / (z + (64 - np)) AS e,
         |          64 - np AS vz
         |        FROM agg),
         |fin AS (SELECT source,
         |          CASE WHEN e <= 160.0 AND vz > 0
         |               THEN 64.0 * ln(64.0 / vz) ELSE e END AS est
         |        FROM est),
         |ex AS (SELECT source, count(DISTINCT term) AS exact_distinct
         |       FROM tok GROUP BY source)
         |SELECT source, exact_distinct, round(est, 2) AS hll_estimate
         |FROM fin JOIN ex USING (source)
         |ORDER BY source""".stripMargin) { (s, dir) =>
      import graft.sketch.HyperLogLog
      val toks = Tables.load(s, dir, "documents")
        .select(col("source"), explode(
          TextFunctions.tokens(TextFunctions.normalize(col("text")))).as("term"))
      val sketch = HyperLogLog.build(toks, col("term"), keys = Seq("source"))
      val exact = toks.groupBy("source")
        .agg(countDistinct(col("term")).as("exact_distinct"))
      HyperLogLog.estimate(sketch, keys = Seq("source"))
        .join(exact, "source")
        .select(col("source"), col("exact_distinct"),
          round(col("hll_estimate"), 2).as("hll_estimate"))
        .orderBy("source")
    },

    // Quality-filter funnel: the default C4/Gopher-style ordered rule
    // ledger fused into ONE scan + ONE aggregate; each row attributes
    // removals to the FIRST rule that rejected the document. The
    // oracle re-derives every rule (length bounds, argmax language
    // ID, stopword floor, repetition cap) and the same first-fail
    // attribution in SQL.
    GraftQuery(
      "c6_quality_funnel", {
        s"""$normCte,
           |$funnelCtes,
           |f AS (SELECT
           |  ${funnelRules(0)} AS r0,
           |  ${funnelRules(1)} AS r1,
           |  ${funnelRules(2)} AS r2,
           |  ${funnelRules(3)} AS r3,
           |  ${funnelRules(4)} AS r4
           |FROM b),
           |a AS (SELECT count(*)::BIGINT AS total,
           |  sum(CASE WHEN NOT r0 THEN 1 ELSE 0 END)::BIGINT AS d0,
           |  sum(CASE WHEN r0 AND NOT r1 THEN 1 ELSE 0 END)::BIGINT AS d1,
           |  sum(CASE WHEN r0 AND r1 AND NOT r2 THEN 1 ELSE 0 END)::BIGINT AS d2,
           |  sum(CASE WHEN r0 AND r1 AND r2 AND NOT r3 THEN 1 ELSE 0 END)::BIGINT AS d3,
           |  sum(CASE WHEN r0 AND r1 AND r2 AND r3 AND NOT r4 THEN 1 ELSE 0 END)::BIGINT AS d4
           |FROM f)
           |SELECT * FROM (
           |  SELECT 1::BIGINT AS stage, 'min_tokens' AS rule,
           |    total AS evaluated, d0 AS dropped, total - d0 AS remaining FROM a
           |  UNION ALL SELECT 2, 'max_tokens', total - d0, d1,
           |    total - d0 - d1 FROM a
           |  UNION ALL SELECT 3, 'lang_en', total - d0 - d1, d2,
           |    total - d0 - d1 - d2 FROM a
           |  UNION ALL SELECT 4, 'stopword_floor', total - d0 - d1 - d2, d3,
           |    total - d0 - d1 - d2 - d3 FROM a
           |  UNION ALL SELECT 5, 'repetition_cap', total - d0 - d1 - d2 - d3, d4,
           |    total - d0 - d1 - d2 - d3 - d4 FROM a
           |) ORDER BY stage""".stripMargin
      }) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      QualityFunnel.report(d, QualityFunnel.defaultRules(col("text")))
        .orderBy("stage")
    },

    // The composed training-data pipeline as ONE plan — the shape a
    // real 100 TB run executes: quality-funnel kept-set (c6's exact
    // rules) → cross-doc span cut (d16) → exact dedup of the cut text
    // → token stats (t1's metrics) over the survivors. Every stage is
    // verified alone elsewhere; this verifies the COMPOSITION. The
    // corpus is scanned ONCE (the funnel filter rides the scan; the
    // kept-set is locally checkpointed so span-cut's two consumers —
    // the span-keyed dup pass and the doc-keyed rebuild join — read
    // the materialized stage output instead of re-scanning, exactly
    // how a production pipeline persists its filtered corpus between
    // stages). Exact dedup is the window form (min-id per content
    // fingerprint): one fp-keyed shuffle, no self-join that would
    // re-execute the upstream lineage. Pinned by PipelinePlanSpec.
    GraftQuery(
      "p1_pipeline",
      s"""$normCte,
         |$funnelCtes,
         |kept AS (SELECT doc_id, norm FROM b
         |  WHERE (${funnelRules.mkString(")\n    AND (")})),
         |tk AS (SELECT doc_id, string_split(norm, ' ') AS a FROM kept),
         |off AS (SELECT doc_id, a,
         |          unnest(generate_series(1, greatest(len(a) - 7, 1))) AS p
         |        FROM tk),
         |sp AS (SELECT doc_id, array_to_string(a[p : p + 7], ' ') AS span,
         |          p, doc_id * 1048576 + p AS occ FROM off),
         |k AS (SELECT doc_id, p, occ, min(occ) OVER (PARTITION BY span) AS keep
         |      FROM sp),
         |dp AS (SELECT doc_id, p FROM k WHERE occ <> keep),
         |isl AS (SELECT doc_id, p,
         |          p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS g
         |        FROM dp),
         |rn AS (SELECT doc_id, min(p) AS rs, max(p) + 7 AS re
         |       FROM isl GROUP BY doc_id, g),
         |rl AS (SELECT doc_id, list(struct_pack(rs := rs, re := re)) AS runs
         |       FROM rn GROUP BY doc_id),
         |j AS (SELECT tk.doc_id, tk.a, rl.runs FROM tk
         |      LEFT JOIN rl ON tk.doc_id = rl.doc_id),
         |cut AS (SELECT doc_id, a, CASE WHEN runs IS NULL THEN a ELSE
         |    [a[ii] for ii in generate_series(1, len(a))
         |     if len(list_filter(runs, r -> ii >= r.rs AND ii <= r.re)) = 0]
         |  END AS kept_toks FROM j),
         |ct AS (SELECT doc_id,
         |         coalesce(array_to_string(kept_toks, ' '), '') AS text_dedup,
         |         (len(a) - len(kept_toks))::BIGINT AS cut_tokens FROM cut),
         |ded AS (SELECT doc_id, text_dedup, cut_tokens,
         |          min(doc_id) OVER (PARTITION BY text_dedup) AS keep_id
         |        FROM ct)
         |SELECT doc_id, md5(text_dedup) AS fp,
         |  len(string_split(text_dedup, ' '))::BIGINT AS n_tok,
         |  cut_tokens,
         |  round(list_sum([length(t) for t in string_split(text_dedup, ' ')]) * 1.0
         |        / greatest(len(string_split(text_dedup, ' ')), 1), 4) AS mean_tok_len
         |FROM ded WHERE doc_id = keep_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "documents")
      val kept = QualityFunnel.kept(d, QualityFunnel.defaultRules(col("text")))
        .localCheckpoint()
      val cut = graft.dedup.SpanDedup.cutText(kept, "doc_id", col("text"), n = 8)
      cut
        .withColumn("fp", TextFunctions.fingerprint(col("text_dedup")))
        .withColumn("_keep", min(col("doc_id")).over(Window.partitionBy("fp")))
        .filter(col("doc_id") === col("_keep"))
        .select(col("doc_id"), col("fp"),
          TextFunctions.tokenCount(col("text_dedup")).cast("long").as("n_tok"),
          col("cut_tokens"),
          TextFunctions.meanTokenLength(col("text_dedup")).as("mean_tok_len"))
        .orderBy("doc_id")
    },

    // Temperature-flattened mixture sampling (α = 0.5, 30% target) —
    // the data-mixing pass that keeps dominant sources from drowning
    // the tail. Rates derive from one |sources|-row count aggregate
    // broadcast back over the corpus; membership is the deterministic
    // md5 bucket, so the oracle reproduces it exactly. NULL source is
    // its own group (null-safe join both sides).
    GraftQuery(
      "t20_mixture_sample",
      """WITH c AS (
        |  SELECT source, count(*) AS n_total FROM documents GROUP BY source),
        |t AS (SELECT sum(n_total)::DOUBLE AS nn,
        |        sum(pow(n_total::DOUBLE, 0.5)) AS z FROM c),
        |r AS (SELECT source, n_total,
        |        floor(least(1.0, 0.3 * nn * pow(n_total::DOUBLE, 0.5) / z
        |            / n_total::DOUBLE) * 4096 + 0.5)::INT AS thr
        |      FROM c, t),
        |k AS (SELECT d.source FROM documents d
        |      JOIN r ON d.source IS NOT DISTINCT FROM r.source
        |      WHERE ('0x' || substr(md5(d.doc_id::varchar), 1, 3))::INT < r.thr)
        |SELECT r.source AS source, r.n_total, coalesce(kk.n_kept, 0) AS n_kept
        |FROM r LEFT JOIN (
        |  SELECT source, count(*) AS n_kept FROM k GROUP BY source) kk
        |  ON r.source IS NOT DISTINCT FROM kk.source
        |ORDER BY r.source""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val kept = Sampling.mixture(docs, "doc_id", "source", 0.5, 0.3)
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
      Sampling.mixtureThresholds(docs, "source", 0.5, 0.3)
        .select(col("source"), col("n_total"))
        .join(kept.withColumnRenamed("source", "_ks"),
          col("source") <=> col("_ks"), "left")
        .select(col("source"), col("n_total"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("source")
    },

    // The INCREMENTAL composed pipeline — the shape a daily ingest
    // actually runs at 100 TB: only the NEW window (doc_id >= 250,
    // the d8/d10 increment convention) flows through the funnel, is
    // deduped in-batch (first-arrival wins) and against the SEEN
    // fingerprint set, and emits stats. In production `seen` is the
    // stored compact digest table (d8's discipline); here it derives
    // from the same corpus so the oracle can reproduce it. The kept
    // set is localCheckpointed once for its two consumers — the
    // increment never re-scans old text, only old fingerprints.
    GraftQuery(
      "p2_incremental_pipeline",
      s"""$normCte,
         |$funnelCtes,
         |kept AS (SELECT doc_id, norm FROM b
         |  WHERE (${funnelRules.mkString(")\n    AND (")})),
         |f AS (SELECT doc_id, norm, md5(norm) AS fp FROM kept),
         |seen AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250),
         |neu AS (SELECT doc_id, norm, fp,
         |          min(doc_id) OVER (PARTITION BY fp) AS keep_id
         |        FROM f WHERE doc_id >= 250)
         |SELECT n2.doc_id, n2.fp,
         |  len(string_split(n2.norm, ' '))::BIGINT AS n_tok
         |FROM neu n2 ANTI JOIN seen ON n2.fp = seen.fp
         |WHERE n2.doc_id = n2.keep_id
         |ORDER BY n2.doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "documents")
      val norm = TextFunctions.normalize(col("text"))
      val kept = QualityFunnel.kept(d, QualityFunnel.defaultRules(col("text")))
        .select(col("doc_id"), norm.as("_norm"),
          TextFunctions.fingerprint(norm).as("fp"))
        .localCheckpoint()
      val seen = kept.filter(col("doc_id") < 250).select("fp").distinct()
      kept.filter(col("doc_id") >= 250)
        .withColumn("_keep", min(col("doc_id")).over(Window.partitionBy("fp")))
        .filter(col("doc_id") === col("_keep"))
        .join(seen, Seq("fp"), "left_anti")
        .select(col("doc_id"), col("fp"),
          size(TextFunctions.tokens(col("_norm"))).cast("long").as("n_tok"))
        .orderBy("doc_id")
    },

    // Statistical quality scoring: per-doc mean token log-prob under
    // the corpus's own unigram distribution (the distributable form of
    // CCNet perplexity filtering, Wenzek et al. 2020) — low = gibberish
    // relative to the collection, high = stopword soup; filters keep
    // the middle band. One scan, two hash aggregates, one token join.
    GraftQuery(
      "t21_unigram_logprob",
      s"""$normCte,
         |tk AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS tok FROM n),
         |f AS (SELECT tok, count(*)::DOUBLE AS c FROM tk GROUP BY tok),
         |t AS (SELECT sum(c) AS total FROM f)
         |SELECT tk.doc_id, count(*) AS n_tokens,
         |  round(avg(ln(f.c / t.total)), 4) AS mean_logprob
         |FROM tk JOIN f USING (tok), t
         |GROUP BY tk.doc_id ORDER BY tk.doc_id""".stripMargin) { (s, dir) =>
      TextOps.unigramLogProb(Tables.load(s, dir, "documents"), "doc_id",
          col("text"))
        .orderBy("doc_id")
    },

    // Deterministic shard-export manifest: hash sharding (md5 of the
    // seeded key, mod N — balanced in expectation, no global sort) +
    // a pseudo-random within-shard order key; the manifest is one
    // hash aggregate. The reproducible-training-order layout step.
    GraftQuery(
      "t22_shard_manifest", {
        val hx = "strpos('0123456789abcdef', substr(hx, %d, 1)) - 1"
        val shardVal = (1 to 6)
          .map(i => s"(${hx.format(i)}) * ${1L << (4 * (6 - i))}")
          .mkString("(", " + ", ")")
        s"""WITH h AS (
           |  SELECT doc_id, text, md5('42:' || doc_id::varchar) AS hx
           |  FROM documents),
           |a AS (
           |  SELECT doc_id, text, hx, ($shardVal % 8)::INT AS shard,
           |    len(string_split($norm, ' '))::BIGINT AS tok
           |  FROM h)
           |SELECT shard, count(*) AS n_docs, sum(tok)::BIGINT AS n_tokens,
           |  sum(strlen(text))::BIGINT AS n_bytes,
           |  min(hx) AS first_key, max(hx) AS last_key
           |FROM a GROUP BY shard ORDER BY shard""".stripMargin
      }) { (s, dir) =>
      // manifest served from the STORED shard layout (ShardStore —
      // per-doc assignment is deterministic, so stored ≡ inline and
      // the oracle recomputes inline; increments advance O(new))
      graft.operators.ShardStore.manifest(s, dir, "documents",
        numShards = 8, seed = "42")
    },

    // Dataset card: per-language, per-source, and overall corpus
    // totals from ONE scan via GROUPING SETS (the general form next
    // to q10's rollup and q15's cube) — the sidecar summary a corpus
    // release publishes.
    GraftQuery(
      "c7_corpus_card",
      s"""WITH pre AS (
         |  SELECT lang, source,
         |    len(string_split($norm, ' '))::BIGINT AS tok,
         |    strlen(text)::BIGINT AS bts
         |  FROM documents)
         |SELECT CASE WHEN GROUPING(lang) = 0 THEN 'lang'
         |            WHEN GROUPING(source) = 0 THEN 'source'
         |            ELSE 'all' END AS dim,
         |  coalesce(lang, source, '*') AS key,
         |  count(*) AS n_docs, sum(tok)::BIGINT AS n_tokens,
         |  sum(bts)::BIGINT AS n_bytes
         |FROM pre GROUP BY GROUPING SETS ((lang), (source), ())
         |ORDER BY dim, key""".stripMargin) { (s, dir) =>
      // card served from the STORED moment partials (SketchStore —
      // per-(lang, source) counts/sums are exactly additive, so the
      // stored fold ≡ the inline corpus aggregate and the oracle
      // recomputes inline; increments advance O(new)); grouping sets
      // run over the tiny folded table, never the corpus
      graft.sketch.SketchStore.card(s, dir, "documents")
        .groupingSets(Seq(Seq(col("lang")), Seq(col("source")), Seq()),
          col("lang"), col("source"))
        .agg(grouping(col("lang")).as("g_lang"),
          grouping(col("source")).as("g_src"),
          sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"), sum(col("n_bytes")).as("n_bytes"))
        .select(
          when(col("g_lang") === 0, lit("lang"))
            .when(col("g_src") === 0, lit("source"))
            .otherwise(lit("all")).as("dim"),
          coalesce(col("lang"), col("source"), lit("*")).as("key"),
          col("n_docs"), col("n_tokens"), col("n_bytes"))
        .orderBy("dim", "key")
    },

    // Quality-curriculum mixture: STORED quality scores bucket the
    // corpus into tiers, t20's temperature mixture (α=0.5) flattens
    // over-represented tiers — the data-mixing pass that keeps scarce
    // high-quality strata from being drowned by the mediocre bulk.
    // Rates from one |tiers|-row broadcast aggregate; the corpus never
    // shuffles; membership is the deterministic md5 bucket.
    GraftQuery(
      "p4_quality_curriculum",
      s"""WITH $qualityCte,
         |tiers AS (
         |  SELECT doc_id, least(floor(quality * 5), 4)::INT AS tier
         |  FROM qual),
         |c AS (SELECT tier, count(*) AS n_total FROM tiers GROUP BY tier),
         |t AS (SELECT sum(n_total)::DOUBLE AS nn,
         |        sum(pow(n_total::DOUBLE, 0.5)) AS z FROM c),
         |r AS (SELECT tier, n_total,
         |        floor(least(1.0, 0.3 * nn * pow(n_total::DOUBLE, 0.5) / z
         |            / n_total::DOUBLE) * 4096 + 0.5)::INT AS thr
         |      FROM c, t),
         |k AS (SELECT d.tier FROM tiers d
         |      JOIN r ON d.tier = r.tier
         |      WHERE ('0x' || substr(md5(d.doc_id::varchar), 1, 3))::INT < r.thr)
         |SELECT r.tier, r.n_total, coalesce(kk.n_kept, 0) AS n_kept
         |FROM r LEFT JOIN (
         |  SELECT tier, count(*) AS n_kept FROM k GROUP BY tier) kk
         |  ON r.tier = kk.tier
         |ORDER BY r.tier""".stripMargin) { (s, dir) =>
      val tiers = graft.functions.QualityStore.scores(s, dir, "documents")
        .select(col("doc_id"),
          least(floor(col("quality") * 5), lit(4)).cast("int").as("tier"))
      val kept = Sampling.mixture(tiers, "doc_id", "tier", 0.5, 0.3)
        .groupBy("tier").agg(count(lit(1)).as("n_kept"))
      Sampling.mixtureThresholds(tiers, "tier", 0.5, 0.3)
        .select(col("tier"), col("n_total"))
        .join(kept.withColumnRenamed("tier", "_kt"),
          col("tier") <=> col("_kt"), "left")
        .select(col("tier"), col("n_total"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("tier")
    },

    // BPE vocabulary training: k merges learned over the word-type
    // histogram (one corpus scan; every iteration runs over the
    // capped type table — O(k * cap), corpus-size-independent). The
    // oracle unrolls the identical chain: pair stats, (count DESC,
    // pair ASC) argmax, space-doubling replace application.
    GraftQuery(
      "t23_bpe_train",
      bpeChainSql(bpeK, bpeCap) +
        s"""
           |SELECT rank, s1, s2, merged, pair_count FROM (
           |  ${(1 to bpeK).map(r => s"SELECT * FROM b$r").mkString("\n  UNION ALL ")}
           |) mm ORDER BY rank""".stripMargin) { (s, dir) =>
      graft.functions.TokenizerStore
        .mergesDf(s, dir, "documents", "text", bpeK, bpeCap)
        .orderBy("rank")
    },

    // Tokenizer application under the STORED merge table: the k
    // learned merges become a literal nested-replace chain inside a
    // per-document transform — pure whole-stage codegen, zero
    // shuffle, no vocabulary join. The oracle re-derives the merges
    // (same chain as t23) and applies them over the distinct word
    // types, then joins back to the token stream.
    GraftQuery(
      "t24_bpe_encode",
      bpeChainSql(bpeK, bpeCap) + bpeEncodeSql(bpeK)) { (s, dir) =>
      val merges = graft.functions.TokenizerStore
        .merges(s, dir, "documents", "text", bpeK, bpeCap)
      graft.functions.Bpe
        .encodeStats(Tables.load(s, dir, "documents"), "doc_id",
          col("text"), merges)
        .orderBy("doc_id")
    },

    // Trained quality classifier: full-batch-GD logistic regression
    // (label: lang = 'en') over t2's bounded feature ratios. One
    // corpus scan per iteration (partial aggregation, 4 doubles to
    // the driver), weights re-enter as literals — the textbook
    // distributed-GD shape. The oracle unrolls the same 5 steps with
    // 8-decimal gradient rounding absorbing summation-order noise.
    GraftQuery("t25_lr_quality",
      lrOracleSql(lrIters) +
        "\nSELECT doc_id, y::INT AS label, score FROM sc ORDER BY doc_id") {
      (s, dir) =>
      import graft.functions.{ClassifierFeatureStore, QualityClassifier}
      // features served from the incremental store (stored ≡ inline
      // bit-for-bit: per-doc fixed-point functions) — §9.14 measured
      // the feature scan as 30x the cost of all five GD iterations
      val feat = ClassifierFeatureStore.features(s, dir, "documents")
      val m = ClassifierFeatureStore.trainedModel(s, dir, "documents",
        lrIters, lr = 1.0)
      QualityClassifier.score(feat, m)
        .select(col("doc_id"), col("label"), col("score"))
        .orderBy("doc_id")
    },

    // Calibration table for the trained classifier: fixed-width
    // 0.005-score bins with document counts, empirical label rate,
    // and mean score — the reliability diagram an ML-ops pipeline
    // publishes next to any learned filter. Fixed-width binning on
    // purpose: it is ONE hash aggregate (quantile binning needs
    // percentile boundaries whose interpolation arithmetic is not
    // bit-portable across engines, and an ntile is a global window),
    // and `floor(score * 200)` on bit-identical doubles can never
    // disagree between engine and oracle.
    GraftQuery(
      "t26_score_calibration",
      lrOracleSql(lrIters) + s"""
         |SELECT floor(score * 200)::INT AS bin,
         |  count(*) AS n_docs, round(avg(y), 4) AS label_rate,
         |  round(avg(score), 4) AS mean_score
         |FROM sc GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
      import graft.functions.{ClassifierFeatureStore, QualityClassifier}
      val feat = ClassifierFeatureStore.features(s, dir, "documents")
      val m = ClassifierFeatureStore.trainedModel(s, dir, "documents",
        lrIters, lr = 1.0)
      QualityClassifier.score(feat, m)
        .groupBy(floor(col("score") * 200).cast("int").as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("label").cast("double")), 4).as("label_rate"),
          round(avg(col("score")), 4).as("mean_score"))
        .orderBy("bin")
    },

    // Feature-hashed TF-IDF sparse embeddings (the hashing trick) —
    // raw text to a retrieval-ready signed-hash vector with no
    // vocabulary dictionary; sparse (doc_id, bucket, w) rows ARE the
    // inverted index v22 retrieves over. md5-derived bucket + sign
    // make the construction bit-reproducible in both engines.
    GraftQuery(
      "t27_hashed_tfidf",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split($norm, ' ')) AS tok
         |  FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |nd AS (SELECT count(*) * 1.0 AS n_docs FROM documents)
         |SELECT doc_id,
         |  ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS bucket,
         |  round(sum((CASE WHEN ('0x' || substr(md5(tok), 16, 1))::BIGINT < 8
         |             THEN 1.0 ELSE -1.0 END)
         |        * tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0)), 4) AS w
         |FROM tf JOIN dfreq USING (tok) CROSS JOIN nd
         |GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin) { (s, dir) =>
      // served from the TfIdfStore artifact; the fresh-vectorization
      // oracle proves stored rows ≡ inline sparseFeatures bit-for-bit
      graft.functions.TfIdfStore.features(s, dir)
        .orderBy("doc_id", "bucket")
    },

    // Interpolated Kneser-Ney bigram LM scoring (the CCNet-style
    // quality filter with a proper LM): per-doc mean log-probability
    // over bigram instances; the continuation distribution replaces
    // raw frequency in the backoff. Formula written identically in
    // both engines — bit-identical doubles before the final round.
    GraftQuery(
      "t28_bigram_kn",
      s"""WITH tk AS (
         |  SELECT doc_id, string_split($norm, ' ') AS a FROM documents),
         |bg AS (
         |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
         |  FROM (SELECT doc_id,
         |          unnest([{'w1': a[i], 'w2': a[i+1]}
         |                  for i in generate_series(1, len(a) - 1)]) AS u
         |        FROM tk WHERE len(a) >= 2)),
         |bc AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
         |cw1 AS (SELECT w1, sum(c) AS ctx, count(*) AS n1f FROM bc GROUP BY w1),
         |pc AS (SELECT w2, count(*) AS n1p FROM bc GROUP BY w2),
         |t AS (SELECT count(*) * 1.0 AS t_types FROM bc)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(avg(ln(greatest(c - 0.75, 0.0) / ctx
         |    + ((0.75 * n1f) / ctx) * (n1p / t_types))), 4) AS mean_logprob
         |FROM bg JOIN bc USING (w1, w2) JOIN cw1 USING (w1)
         |  JOIN pc USING (w2) CROSS JOIN t
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.BigramLm.scoreDocs(
          Tables.load(s, dir, "documents"), "doc_id", col("text"))
        .orderBy("doc_id")
    },

    // Corpus DRIFT card: distributional comparison of two corpus
    // slices (stand-in for two snapshot versions) — smoothed unigram
    // KL and Jensen-Shannon divergence over the union vocabulary,
    // plus vocab overlap. One count aggregate per side, one
    // vocab-keyed full-outer join, one scalar aggregate: the
    // monitoring query a daily-ingest pipeline runs to catch
    // distribution shift before training does.
    GraftQuery(
      "c8_corpus_drift",
      s"""WITH ta AS (
         |  SELECT unnest(string_split($norm, ' ')) AS tok
         |  FROM documents WHERE doc_id < 250),
         |tb AS (
         |  SELECT unnest(string_split($norm, ' ')) AS tok
         |  FROM documents WHERE doc_id >= 250),
         |ca AS (SELECT tok, count(*) AS c FROM ta GROUP BY tok),
         |cb AS (SELECT tok, count(*) AS c FROM tb GROUP BY tok),
         |j AS (
         |  SELECT coalesce(ca.c, 0) AS a, coalesce(cb.c, 0) AS b
         |  FROM ca FULL OUTER JOIN cb USING (tok)),
         |t AS (SELECT sum(a) * 1.0 AS na, sum(b) * 1.0 AS nb,
         |        count(*) * 1.0 AS v,
         |        sum(CASE WHEN a > 0 AND b > 0 THEN 1 ELSE 0 END)
         |          AS n_shared
         |      FROM j)
         |SELECT v::BIGINT AS vocab_union, n_shared::BIGINT AS vocab_shared,
         |  round(sum(((a + 1) / (na + v)) *
         |    ln(((a + 1) / (na + v)) / ((b + 1) / (nb + v)))), 4) AS kl_ab,
         |  round(sum(
         |    0.5 * ((a + 1) / (na + v)) *
         |      ln(((a + 1) / (na + v)) /
         |        (0.5 * ((a + 1) / (na + v)) + 0.5 * ((b + 1) / (nb + v))))
         |    + 0.5 * ((b + 1) / (nb + v)) *
         |      ln(((b + 1) / (nb + v)) /
         |        (0.5 * ((a + 1) / (na + v)) + 0.5 * ((b + 1) / (nb + v))))
         |  ), 4) AS js_div
         |FROM j CROSS JOIN t
         |GROUP BY v, n_shared""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      def counts(cond: org.apache.spark.sql.Column) = d.where(cond)
        .select(explode(TextFunctions.tokens(
          TextFunctions.normalize(col("text")))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val j = counts(col("doc_id") < 250).withColumnRenamed("c", "ca")
        .join(counts(col("doc_id") >= 250).withColumnRenamed("c", "cb"),
          Seq("tok"), "full_outer")
        .select(coalesce(col("ca"), lit(0L)).as("a"),
          coalesce(col("cb"), lit(0L)).as("b"))
        .localCheckpoint()
      val t = j.agg((sum("a") * 1.0).as("na"), (sum("b") * 1.0).as("nb"),
        (count(lit(1)) * 1.0).as("v"),
        sum(when(col("a") > 0 && col("b") > 0, 1).otherwise(0)).as("n_shared"))
      val pa = (col("a") + 1) / (col("na") + col("v"))
      val pb = (col("b") + 1) / (col("nb") + col("v"))
      val m = lit(0.5) * pa + lit(0.5) * pb
      j.crossJoin(broadcast(t))
        .groupBy(col("v"), col("n_shared"))
        .agg(round(sum(pa * log(pa / pb)), 4).as("kl_ab"),
          round(sum(lit(0.5) * pa * log(pa / m)
            + lit(0.5) * pb * log(pb / m)), 4).as("js_div"))
        .select(col("v").cast("long").as("vocab_union"),
          col("n_shared").cast("long").as("vocab_shared"),
          col("kl_ab"), col("js_div"))
    },

    // The STORED-LM ingest gate: incoming docs (>= 250) scored under
    // the KN bigram model of the stored corpus slice (< 250) — the
    // perplexity filter every curation pipeline runs, with model
    // counts maintained O(new) by the artifact engine and defined
    // OOV semantics (add-one continuation backoff; every P > 0).
    GraftQuery(
      "t29_stored_lm_score",
      s"""WITH tk AS (
         |  SELECT doc_id, string_split($norm, ' ') AS a FROM documents),
         |mb AS (
         |  SELECT u.w1 AS w1, u.w2 AS w2
         |  FROM (SELECT doc_id,
         |          unnest([{'w1': a[i], 'w2': a[i+1]}
         |                  for i in generate_series(1, len(a) - 1)]) AS u
         |        FROM tk WHERE len(a) >= 2 AND doc_id < 250)),
         |bc AS (SELECT w1, w2, count(*) AS c FROM mb GROUP BY 1, 2),
         |cw1 AS (SELECT w1, sum(c) AS ctx, count(*) AS n1f FROM bc GROUP BY w1),
         |pc AS (SELECT w2, count(*) AS n1p FROM bc GROUP BY w2),
         |tt AS (SELECT count(*) * 1.0 AS t_types FROM bc),
         |vv AS (SELECT count(DISTINCT t) * 1.0 AS v_vocab
         |       FROM (SELECT w1 AS t FROM bc UNION ALL SELECT w2 FROM bc)),
         |bg AS (
         |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
         |  FROM (SELECT doc_id,
         |          unnest([{'w1': a[i], 'w2': a[i+1]}
         |                  for i in generate_series(1, len(a) - 1)]) AS u
         |        FROM tk WHERE len(a) >= 2 AND doc_id >= 250))
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(avg(ln(CASE WHEN ctx IS NULL
         |    THEN (coalesce(n1p, 0) + 1) / (t_types + v_vocab)
         |    ELSE greatest(coalesce(c, 0) - 0.75, 0.0) / ctx
         |      + ((0.75 * n1f) / ctx)
         |        * ((coalesce(n1p, 0) + 1) / (t_types + v_vocab)) END)), 4)
         |    AS mean_logprob
         |FROM bg LEFT JOIN bc USING (w1, w2) LEFT JOIN cw1 USING (w1)
         |  LEFT JOIN pc USING (w2) CROSS JOIN tt CROSS JOIN vv
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      graft.functions.BigramLmStore.scoreBatch(s, dir, "documents",
          batch = d.filter(col("doc_id") >= 250), "doc_id",
          corpusFilter = col("doc_id") < 250)
        .orderBy("doc_id")
    },

    // Readability scoring (Flesch reading ease, Flesch 1948) with a
    // deterministic syllable proxy (vowel-group runs) — the classic
    // audience-level quality signal next to t2/t21/t28. Pure regex
    // counts + fixed-point arithmetic, identical in both engines;
    // sentence count floors at 1 so fragments never divide by zero.
    GraftQuery(
      "t30_readability",
      s"""SELECT doc_id,
         |  length(string_split($norm, ' ')) AS n_words,
         |  greatest(length(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
         |  length(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables,
         |  round(206.835
         |    - 1.015 * (length(string_split($norm, ' ')) * 1.0
         |        / greatest(length(regexp_extract_all(text, '[.!?]+')), 1))
         |    - 84.6 * (length(regexp_extract_all(lower(text), '[aeiouy]+')) * 1.0
         |        / greatest(length(string_split($norm, ' ')), 1)), 2)
         |    AS flesch
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val nWords = TextFunctions.tokenCount(TextFunctions.normalize(col("text")))
      val nSent = greatest(
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1))
      val nSyl = size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
      d.select(col("doc_id"),
          nWords.as("n_words"), nSent.as("n_sentences"), nSyl.as("n_syllables"),
          round(lit(206.835)
            - lit(1.015) * (nWords * lit(1.0) / nSent)
            - lit(84.6) * (nSyl * lit(1.0) / greatest(nWords, lit(1))), 2)
            .as("flesch"))
        .orderBy("doc_id")
    },

    // STORED corpus profile: per-source doc/token counts (card moment
    // partials) + HyperLogLog distinct-token estimates (register
    // partials, folded by per-register max — the HLL merge law),
    // everything served from the SketchStore artifact with zero
    // corpus scans (plan-asserted in SketchStoreSpec). The oracle
    // re-derives counts and the full register/rank/correction math
    // from the raw corpus — sketch folds are exactly associative, so
    // stored ≡ inline bit-for-bit however ingest chunked the corpus.
    GraftQuery(
      "c9_stored_profile",
      s"""$normCte,
         |tok AS (SELECT d.source, unnest(string_split(n.norm, ' ')) AS term
         |        FROM n JOIN documents d USING (doc_id)),
         |h AS (SELECT source,
         |        ('0x' || substr(md5(term), 1, 15))::BIGINT AS v FROM tok),
         |hr AS (SELECT source, v % 64 AS register,
         |         CASE WHEN v // 64 = 0 THEN 55
         |              ELSE 54 - floor(log2(v // 64))::BIGINT END AS rho
         |       FROM h),
         |sk AS (SELECT source, register, max(rho) AS r
         |       FROM hr GROUP BY source, register),
         |agg AS (SELECT source, sum(power(2.0, -r)) AS z, count(*) AS np
         |        FROM sk GROUP BY source),
         |e0 AS (SELECT source,
         |          0.709 * 64 * 64 / (z + (64 - np)) AS e,
         |          64 - np AS vz
         |        FROM agg),
         |fin AS (SELECT source,
         |          CASE WHEN e <= 160.0 AND vz > 0
         |               THEN 64.0 * ln(64.0 / vz) ELSE e END AS est
         |        FROM e0),
         |c AS (SELECT d.source, count(*)::BIGINT AS n_docs,
         |        sum(len(string_split(n.norm, ' ')))::BIGINT AS n_tokens
         |      FROM n JOIN documents d USING (doc_id) GROUP BY d.source)
         |SELECT source, n_docs, n_tokens,
         |  round(est, 2) AS hll_distinct
         |FROM fin JOIN c USING (source)
         |ORDER BY source""".stripMargin) { (s, dir) =>
      import graft.sketch.{HyperLogLog, SketchStore}
      val counts = SketchStore.card(s, dir, "documents")
        .groupBy("source")
        .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
      HyperLogLog.estimate(SketchStore.hll(s, dir, "documents"),
          keys = Seq("source"))
        .join(counts, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("hll_estimate"), 2).as("hll_distinct"))
        .orderBy("source")
    },

    // STORED token-count quantiles: c5's log-histogram read over the
    // persisted bin partials — the length-distribution card a corpus
    // release publishes, answered without touching the corpus. Bin
    // boundaries are fixed arithmetic (no merge-order dependence at
    // all), so the stored fold is bit-deterministic and the oracle's
    // full-corpus re-derivation hash-matches.
    GraftQuery(
      "c10_stored_quantiles",
      s"""WITH h AS (
         |  SELECT (floor(log2(tok)) * 16
         |          + floor((tok / power(2.0, floor(log2(tok))) - 1) * 16)
         |         )::BIGINT AS bucket,
         |         count(*) AS cnt
         |  FROM (SELECT len(string_split($norm, ' '))::DOUBLE AS tok
         |        FROM documents) tt WHERE tok > 0 GROUP BY 1),
         |w AS (
         |  SELECT bucket, cnt,
         |    sum(cnt) OVER (ORDER BY bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         |    sum(cnt) OVER ()::BIGINT AS total
         |  FROM h),
         |qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
         |sel AS (
         |  SELECT q, min(bucket) AS bucket
         |  FROM qs JOIN w ON cum >= q * total GROUP BY q)
         |SELECT q,
         |  round((1.0 + (bucket % 16) / 16.0) * power(2.0, bucket // 16), 4)
         |    AS hist_est
         |FROM sel ORDER BY q""".stripMargin) { (s, dir) =>
      import graft.sketch.{LogHistogram, SketchStore}
      LogHistogram.quantiles(
          SketchStore.tokenHist(s, dir, "documents"), Seq(0.5, 0.9, 0.99))
        .select(col("q"), round(col("est"), 4).as("hist_est"))
        .orderBy("q")
    },

    // STORED CountMin estimates: c3's probe-term frequency lookups
    // over the persisted cell partials (counters fold by sum — the
    // sketch never rescans the token stream it summarized). Same
    // probe list and cell math as c3 via the shared cmsEstCtes, so
    // the two oracles cannot de-synchronize.
    GraftQuery(
      "c11_stored_cms",
      cmsEstCtes +
        """
          |SELECT term, cms_count FROM est ORDER BY term""".stripMargin) {
      (s, dir) =>
      import graft.sketch.{CountMin, SketchStore}
      val probeDf = s.createDataFrame(cmsProbes.map(Tuple1.apply)).toDF("term")
      CountMin.estimate(SketchStore.cms(s, dir, "documents"), probeDf, "term",
          SketchStore.Depth, SketchStore.Width)
        .select(col("term"), col("cms_count"))
        .orderBy("term")
    },

    // ADAPTIVE-width stored CountMin: c11 with the width sized from
    // the stored exact vocabulary (t32's artifact) instead of a fixed
    // constant — §9.21 measured fixed width-512 drowning in collision
    // mass at 50 k vocab; next-pow2(4·|vocab|) keeps the estimate
    // inside CMS theory's e/width band at any corpus. The width rides
    // the artifact key, so differently-sized sketches coexist and
    // mixed-width partials can never fold. The oracle re-derives the
    // width from the corpus with the same integer pow2 ladder, then
    // the full cell/estimate chain at that width.
    GraftQuery(
      "c12_adaptive_cms",
      cmsAdaptiveEstCtes +
        """
          |SELECT term, cms_count FROM est ORDER BY term""".stripMargin) {
      (s, dir) =>
      import graft.sketch.{CountMin, SketchStore}
      val (sk, w) = SketchStore.cmsAdaptive(s, dir, "documents")
      val probeDf = s.createDataFrame(cmsProbes.map(Tuple1.apply)).toDF("term")
      CountMin.estimate(sk, probeDf, "term", SketchStore.Depth, w)
        .select(col("term"), col("cms_count"))
        .orderBy("term")
    }
  )

  private final val lrIters = 5

  /** DuckDB unroll of QualityClassifier.train + score: the feature
    * CTE mirrors t2's rounded sub-ratios, then per iteration r one
    * gradient aggregate (rounded to 8 decimals — the grid that
    * absorbs double-summation order differences) and one weight
    * update, every dot product written with the same left-to-right
    * associativity as the Spark side.
    */
  private def lrOracleSql(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH f AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       |    round(least(len(string_split(norm, ' ')) * 1.0 / 50.0, 1.0), 4) AS f1,
       |    round(length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
       |          / greatest(length(text), 1), 4) AS f2,
       |    round(least(round(${stopCountSql("en")} * 1.0
       |          / greatest(len(string_split(norm, ' ')), 1), 4) * 4.0, 1.0), 4) AS f3
       |  FROM (SELECT doc_id, text, lang, $norm AS norm FROM documents) nn),
       |w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)""".stripMargin
    for (r <- 1 to iters) sb ++= s""",
       |g$r AS (SELECT round(avg(p - y), 8) AS gb,
       |    round(avg((p - y) * f1), 8) AS gw1,
       |    round(avg((p - y) * f2), 8) AS gw2,
       |    round(avg((p - y) * f3), 8) AS gw3
       |  FROM (SELECT y, f1, f2, f3, 1.0 / (1.0 + exp(-(w.b + w.w1 * f1
       |      + w.w2 * f2 + w.w3 * f3))) AS p
       |    FROM f, w${r - 1} w) s$r),
       |w$r AS (SELECT w.b - 1.0 * g.gb AS b, w.w1 - 1.0 * g.gw1 AS w1,
       |    w.w2 - 1.0 * g.gw2 AS w2, w.w3 - 1.0 * g.gw3 AS w3
       |  FROM w${r - 1} w, g$r g)""".stripMargin
    sb ++= s""",
       |sc AS (SELECT doc_id, y,
       |  round(1.0 / (1.0 + exp(-(w.b + w.w1 * f1 + w.w2 * f2 + w.w3 * f3))), 4)
       |    AS score
       |FROM f, w$iters w)""".stripMargin
    sb.toString
  }

  // final + literal: compile-time constants, safe to reference from
  // `all` above regardless of declaration order
  private final val bpeK = 8
  private final val bpeCap = 4096

  /** DuckDB unroll of Bpe.train's merge chain: word-type histogram
    * (top-cap by count DESC, word ASC), then per rank r the pair
    * stats over seg r-1, the deterministic argmax b_r, and the merged
    * segmentation s_r via the space-doubling replace — the same three
    * steps, same tiebreaks, same string semantics as the Spark side.
    */
  private def bpeChainSql(k: Int, cap: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""$normCte,
       |tkw AS (SELECT unnest(string_split(norm, ' ')) AS word FROM n),
       |wt AS (SELECT word, count(*)::BIGINT AS cnt FROM tkw GROUP BY word
       |       ORDER BY cnt DESC, word LIMIT $cap),
       |s0 AS (SELECT word, cnt,
       |  ' ' || array_to_string(regexp_extract_all(word, '.'), ' ') || ' ' AS seg
       |  FROM wt)""".stripMargin
    for (r <- 1 to k) sb ++= s""",
       |p$r AS (SELECT pr AS pair, sum(cnt)::BIGINT AS c FROM (
       |    SELECT cnt, unnest(list_transform(range(1, len(sy)),
       |      i -> sy[i] || ' ' || sy[i + 1])) AS pr
       |    FROM (SELECT cnt, string_split(trim(seg), ' ') AS sy FROM s${r - 1}) q$r
       |  ) u$r GROUP BY pr),
       |b$r AS (SELECT $r::INT AS rank, string_split(pair, ' ')[1] AS s1,
       |    string_split(pair, ' ')[2] AS s2, replace(pair, ' ', '') AS merged,
       |    c AS pair_count
       |  FROM p$r ORDER BY c DESC, pair LIMIT 1),
       |s$r AS (SELECT word, cnt, replace(replace(replace(seg, ' ', '  '),
       |    ' ' || b.s1 || '  ' || b.s2 || ' ', ' ' || b.merged || ' '),
       |    '  ', ' ') AS seg
       |  FROM s${r - 1}, b$r b)""".stripMargin
    sb.toString
  }

  /** DuckDB apply-side of t24: fold every learned merge over the
    * distinct word types of the token stream (NOT just the capped
    * training types — merges apply to any word), count pieces, join
    * back, aggregate per document.
    */
  private def bpeEncodeSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= s""",
       |tokd AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS word FROM n),
       |e0 AS (SELECT word,
       |  ' ' || array_to_string(regexp_extract_all(word, '.'), ' ') || ' ' AS seg
       |  FROM (SELECT DISTINCT word FROM tokd) dw)""".stripMargin
    for (r <- 1 to k) sb ++= s""",
       |e$r AS (SELECT word, replace(replace(replace(seg, ' ', '  '),
       |    ' ' || b.s1 || '  ' || b.s2 || ' ', ' ' || b.merged || ' '),
       |    '  ', ' ') AS seg
       |  FROM e${r - 1}, b$r b)""".stripMargin
    sb ++= s""",
       |pc AS (SELECT word, len(string_split(trim(seg), ' '))::BIGINT AS np
       |       FROM e$k)
       |SELECT t.doc_id, count(*)::BIGINT AS n_words, sum(pc.np)::BIGINT AS n_pieces,
       |  round(sum(pc.np)::DOUBLE / count(*), 4) AS pieces_per_word
       |FROM tokd t JOIN pc USING (word)
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin
    sb.toString
  }

  /** Probe terms for c3 — common corpus tokens plus one absent term
    * (whose estimate is pure collision mass). Lazy: referenced from
    * `all`, which initializes first in declaration order.
    */
  private lazy val cmsProbes = Seq("table", "scan", "row", "hash", "fast",
    "merge", "window", "value", "spark", "zzzabsent")

  /** Shared CMS oracle fragments — md5 cell-index math, per-depth
    * union, and the full estimate-side CTE chain — used by BOTH c3
    * (inline sketch demo) and c11 (store-served estimates): one
    * definition so the two verifications can never silently
    * de-synchronize (the bm25IndexCte discipline).
    */
  private def cmsCellSql(e: String, d: Int,
      widthSql: String = graft.sketch.SketchStore.Width.toString): String = {
    val P = MinHashLSH.P
    val (a, b, c) = MinHashLSH.hashParams(d)
    s"((($a * (('0x' || substr(md5($e), 1, 15))::BIGINT % $P) % $P" +
      s" + $b * (('0x' || substr(md5($e), 16, 15))::BIGINT % $P) % $P" +
      s" + $c) % $P) % $widthSql)"
  }

  private def cmsDepthCells(src: String, withCnt: Boolean,
      widthSql: String = graft.sketch.SketchStore.Width.toString,
      extraFrom: String = ""): String =
    (0 until graft.sketch.SketchStore.Depth).map(d =>
      s"SELECT term${if (withCnt) ", cnt" else ""}, $d AS d, " +
        s"${cmsCellSql("term", d, widthSql)} AS cell FROM $src$extraFrom")
      .mkString("\n  UNION ALL\n  ")

  private lazy val cmsEstCtes: String = {
    val probeList = cmsProbes.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""$normCte,
       |tok AS (SELECT unnest(string_split(norm, ' ')) AS term FROM n),
       |tc AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
       |cells AS (
       |  ${cmsDepthCells("tc", withCnt = true)}),
       |sk AS (SELECT d, cell, sum(cnt)::BIGINT AS c FROM cells GROUP BY d, cell),
       |probes AS (SELECT unnest($probeList) AS term),
       |pc AS (
       |  ${cmsDepthCells("probes", withCnt = false)}),
       |est AS (
       |  SELECT pc.term, min(coalesce(sk.c, 0))::BIGINT AS cms_count
       |  FROM pc LEFT JOIN sk USING (d, cell) GROUP BY pc.term)""".stripMargin
  }

  /** c12's oracle: the same estimate chain with the WIDTH derived from
    * the corpus vocabulary the way `SketchStore.adaptiveCmsWidth`
    * derives it from the stored artifact — least power of two ≥
    * 4·|vocab|, floored at the fixed demo width. The pow2 ladder is
    * re-derived with integer comparisons (generate_series, no log2
    * floats), so both engines compute the identical width from the
    * identical corpus.
    */
  private lazy val cmsAdaptiveEstCtes: String = {
    val probeList = cmsProbes.map(t => s"'$t'").mkString("[", ", ", "]")
    val floorW = graft.sketch.SketchStore.Width
    s"""$normCte,
       |tok AS (SELECT unnest(string_split(norm, ' ')) AS term FROM n),
       |w AS (
       |  SELECT (SELECT min(p)
       |          FROM (SELECT CAST(power(2, g) AS BIGINT) AS p
       |                FROM generate_series(9, 30) t(g)) pp
       |          WHERE p >= greatest($floorW,
       |            4 * (SELECT count(DISTINCT term) FROM tok))) AS width),
       |tc AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
       |cells AS (
       |  ${cmsDepthCells("tc", withCnt = true, widthSql = "w.width",
              extraFrom = ", w")}),
       |sk AS (SELECT d, cell, sum(cnt)::BIGINT AS c FROM cells GROUP BY d, cell),
       |probes AS (SELECT unnest($probeList) AS term),
       |pc AS (
       |  ${cmsDepthCells("probes", withCnt = false, widthSql = "w.width",
              extraFrom = ", w")}),
       |est AS (
       |  SELECT pc.term, min(coalesce(sk.c, 0))::BIGINT AS cms_count
       |  FROM pc LEFT JOIN sk USING (d, cell) GROUP BY pc.term)""".stripMargin
  }
}
