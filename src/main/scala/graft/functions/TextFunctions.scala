package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines:
  * tokenization, token counting, quality scoring, language ID,
  * fingerprinting. Everything is built-in Catalyst expressions
  * (codegen'd, no UDFs — SURVEY.md §2.11's zero-UDF stance carries
  * over to the extensions), so the whole stage stays inside
  * WholeStageCodegen and scales linearly with executors.
  *
  * Hash choice: md5 (not xxhash64) wherever an oracle compares values
  * cross-engine — DuckDB and Spark agree on md5's hex form. Swap in
  * `xxhash64` for production throughput; the operator shapes are
  * identical.
  */
object TextFunctions {

  /** Whitespace-collapsed, trimmed, lowercased text — the canonical
    * form all hashing/tokenizing starts from.
    */
  def normalize(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of an already-normalized column. */
  def tokens(norm: Column): Column = split(norm, " ")

  /** Word count (whitespace tokenization). */
  def tokenCount(norm: Column): Column = size(tokens(norm))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks — a cheap proxy for subword tokenizer
    * budget accounting.
    */
  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Mean token length, 4 decimals. */
  def meanTokenLength(norm: Column): Column = {
    val toks = tokens(norm)
    round(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
      / greatest(size(toks), lit(1)), 4)
  }

  /** Punctuation-to-character ratio, 4 decimals. */
  def punctRatio(c: Column): Column =
    round(size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double")
      / greatest(length(c), lit(1)), 4)

  /** Small per-language stopword lists for the heuristic language ID.
    * Deliberately tiny: language ID at corpus scale is a pruning
    * heuristic, not a classifier.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "por", "con", "los"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "pour", "dans", "les"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ist", "den", "von", "mit"))

  private def stopCount(norm: Column, words: Seq[String]): Column = {
    val lits = array(words.map(lit): _*)
    size(filter(tokens(norm), t => array_contains(lits, t)))
  }

  /** English-stopword ratio over tokens, 4 decimals. */
  def stopwordRatio(norm: Column): Column =
    round(stopCount(norm, stopwords.head._2).cast("double")
      / greatest(tokenCount(norm), lit(1)), 4)

  /** Composite document-quality score in [0, 1], 4 decimals:
    * length saturation (40%), low punctuation (30%), stopword
    * plausibility (30%) — the standard cheap pre-filters an LLM data
    * pipeline applies before anything expensive.
    */
  def qualityScore(raw: Column, norm: Column): Column =
    round(
      least(tokenCount(norm).cast("double") / 50.0, lit(1.0)) * 0.4
        + (lit(1.0) - punctRatio(raw)) * 0.3
        + least(stopwordRatio(norm) * 4.0, lit(1.0)) * 0.3,
      4)

  /** Heuristic language ID: argmax of per-language stopword hit
    * counts; deterministic tie-break by list order, 'und' when no
    * stopword hits at all.
    */
  def langId(norm: Column): Column = {
    val counts = stopwords.map { case (lang, words) => lang -> stopCount(norm, words) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und"): Column) { case ((lang, cnt), els) =>
      when(cnt > 0 && cnt === best, lit(lang)).otherwise(els)
    }
  }

  /** Whole-document fingerprint: md5 of the normalized text. */
  def fingerprint(norm: Column): Column = md5(norm)

  /** Rolling-window fingerprint: lexicographic min of the md5s of all
    * `n`-char shingles — stable under small edits far from the
    * minimizing window (the content-defined-chunking trick).
    */
  def minShingleFingerprint(norm: Column, n: Int = 5): Column =
    array_min(transform(graft.dedup.Shingles.charShingles(norm, n), sh => md5(sh)))

  /** PII redaction rules, applied in this order: (name, pattern,
    * replacement). Patterns restrict themselves to the syntax Java
    * regex and RE2 share (char classes, bounded repeats, \b) so the
    * DuckDB oracle applies the identical strings; replacements
    * contain no digits or '@', so later rules never match inside an
    * earlier rule's placeholder.
    */
  val piiRules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b", "<IP>"),
    ("phone", "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}\\b", "<PHONE>"),
    ("num", "[0-9]{6,}", "<NUM>"))

  /** Text with every PII rule applied (sequential regexp_replace
    * chain — one codegen'd projection, no UDF).
    */
  def redactPii(c: Column): Column =
    piiRules.foldLeft(c) { case (acc, (_, p, r)) => regexp_replace(acc, p, r) }

  /** Occurrence count of one named PII rule on the ORIGINAL text
    * (counts are defined pre-redaction, per rule, independently).
    */
  def piiCount(c: Column, rule: String): Column = {
    val p = piiRules.find(_._1 == rule)
      .getOrElse(sys.error(s"unknown pii rule: $rule"))._2
    size(regexp_extract_all(c, lit(p), lit(0)))
  }
}
