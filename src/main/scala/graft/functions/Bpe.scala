package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.ArtifactStore

/** Distributed BPE (byte-pair-encoding) vocabulary training and
  * tokenizer application — the subword-tokenizer step of a training
  * pipeline, until now approximated by `TextFunctions.tokenCountBpe`'s
  * regex proxy.
  *
  * Spark-first shape (and why it scales):
  *
  *  - **Training operates on the word-TYPE histogram, not the
  *    corpus.** One distributed scan aggregates (word, count) — the
  *    only pass whose cost grows with corpus size. Heaps' law keeps
  *    the type table sublinear in corpus tokens, and `cap` bounds it
  *    outright (keep the top-`cap` types by count; ties to the
  *    lexicographically smaller word — real trainers bound the same
  *    way via min_frequency). Every merge iteration then runs over
  *    the cached, capped type table: k iterations cost O(k * cap *
  *    maxWordLen), independent of corpus size.
  *  - **Each iteration's argmax is one job over the tiny type table**
  *    ending in `.head()` — a single driver row per iteration (the
  *    same driver-bounded contract as the IVF codebook collects), not
  *    a corpus collect.
  *  - **Application is pure codegen string ops, zero shuffle.** The k
  *    learned merges become literal nested `replace` chains inside a
  *    `transform` lambda over each document's token array — the whole
  *    tokenizer runs inside whole-stage codegen, embarrassingly
  *    parallel, no join against a vocabulary table. (The alternative
  *    — apply over DISTINCT types and join back — trades that for a
  *    shuffle of the full token stream; per-doc codegen wins at scale
  *    because it moves no data.)
  *
  * Determinism contract (what lets the DuckDB oracle unroll the same
  * chain): pair counts are exact integers; the best pair is
  * (count DESC, "s1 s2" ASC); merge application is the space-doubling
  * replace — `collapse(replace(double(seg), " s1  s2 ", " s1s2 "))` —
  * whose leftmost non-overlapping semantics are identical in Spark
  * and DuckDB (probed: " a b a b " merges BOTH pairs, " a a a "
  * merges only the first).
  *
  * Reference anchor: the reference has no subword machinery (its text
  * side is ES-analyzed terms, loadData.py:1-40); this is part of the
  * training-data extension surface the engine adds.
  */
object Bpe {

  /** One learned merge: rank r (1-based), the symbol pair, its
    * weighted pair count at selection time.
    */
  final case class Merge(rank: Int, s1: String, s2: String, count: Long) {
    def merged: String = s1 + s2
  }

  /** Padded initial segmentation " c1 c2 ... cn " of a word column. */
  private def charSeg(word: Column): Column =
    concat(lit(" "),
      array_join(regexp_extract_all(word, lit("."), lit(0)), " "),
      lit(" "))

  /** Apply one merge to a padded segmentation: double every space so
    * adjacent matches stop sharing their delimiter, replace, collapse.
    */
  private def applyMerge(seg: Column, m: Merge): Column =
    replace(
      replace(
        replace(seg, lit(" "), lit("  ")),
        lit(s" ${m.s1}  ${m.s2} "), lit(s" ${m.merged} ")),
      lit("  "), lit(" "))

  /** Adjacent symbol pairs "a b" of a padded segmentation (overlapping
    * enumeration — standard BPE pair statistics).
    */
  private def pairsOf(seg: Column): Column = {
    val syms = split(trim(seg), " ")
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => concat(element_at(syms, i), lit(" "), element_at(syms, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** Word-type histogram of `textCol` over `df`, capped to the top
    * `cap` types by (count DESC, word ASC). Columns: (word, cnt).
    * The cap is a TakeOrderedAndProject (per-partition heaps + one
    * cap-row driver merge), never a global sort of the type table.
    */
  def wordTypes(df: DataFrame, textCol: Column, cap: Int): DataFrame =
    df.select(explode(TextFunctions.tokens(TextFunctions.normalize(textCol)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(cap)

  /** Train `k` merges over `df`'s `textCol`. Returns the ordered merge
    * list; stops early if the type table runs out of pairs.
    */
  def train(df: DataFrame, textCol: Column, k: Int, cap: Int): Seq[Merge] = {
    val types = wordTypes(df, textCol, cap).cache()
    try {
      var merges = Vector.empty[Merge]
      var seg: Column = charSeg(col("word"))
      var r = 1
      var done = false
      while (r <= k && !done) {
        val best = types
          .select(col("cnt"), explode(pairsOf(seg)).as("pair"))
          .groupBy("pair").agg(sum("cnt").as("c"))
          .orderBy(col("c").desc, col("pair"))
          .limit(1).collect()
        if (best.isEmpty) done = true
        else {
          val Array(s1, s2) = best(0).getString(0).split(" ", 2)
          val m = Merge(r, s1, s2, best(0).getLong(1))
          merges :+= m
          seg = applyMerge(seg, m)
          r += 1
        }
      }
      merges
    } finally { types.unpersist(); () }
  }

  /** The merge list as a DataFrame (rank, s1, s2, merged, pair_count),
    * the trainer's registered-query output shape.
    */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("s1", StringType, nullable = false),
      StructField("s2", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(merges.map(m =>
        Row(m.rank, m.s1, m.s2, m.merged, m.count)): _*),
      schema)
  }

  /** Tokenize one word column with a learned merge list: the padded
    * char segmentation folded through every merge in rank order —
    * a literal nested-replace chain, fully codegen'd.
    */
  def encodeSeg(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(charSeg(word))(applyMerge)

  /** Subword piece count of one word under the merge list. */
  def pieceCount(word: Column, merges: Seq[Merge]): Column =
    size(split(trim(encodeSeg(word, merges)), " "))

  /** Per-document tokenization stats under a learned merge list:
    * (id, n_words, n_pieces, pieces_per_word). Zero-shuffle: one
    * projection per document, the merge chain inlined as literals.
    */
  def encodeStats(df: DataFrame, idCol: String, textCol: Column,
      merges: Seq[Merge]): DataFrame = {
    val toks = TextFunctions.tokens(TextFunctions.normalize(textCol))
    df.select(col(idCol), toks.as("_toks"))
      .select(col(idCol),
        size(col("_toks")).cast("long").as("n_words"),
        aggregate(
          transform(col("_toks"), w => pieceCount(w, merges)),
          lit(0L), (acc, x) => acc + x).as("n_pieces"))
      .withColumn("pieces_per_word",
        round(col("n_pieces").cast("double") / col("n_words"), 4))
  }
}

/** Persisted trained BPE tokenizer — CodebookStore's build-once /
  * query-many discipline for the merge table: a corpus keys its
  * tokenizer by content fingerprint + every training parameter, a
  * fleet of encode queries reads the SAME stored merges (plus a
  * per-process memo of the tiny parsed list), and training
  * determinism makes stored bit-identical to inline.
  */
object TokenizerStore {

  private val memo = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[Bpe.Merge]]()

  private[graft] def memoSize: Int = memo.size()

  /** Stored merge table for `table`.`textCol` at `sfDir`; trained and
    * committed on first use.
    */
  def merges(spark: SparkSession, sfDir: String, table: String,
      textCol: String, k: Int, cap: Int): Seq[Bpe.Merge] = {
    val h = ArtifactStore.io(s"$sfDir/$table.parquet",
      s"bpe_${textCol}_k${k}_cap$cap")
    if (!h.exists) {
      val trained = Bpe.train(
        graft.core.Tables.load(spark, sfDir, table), col(textCol), k, cap)
      h.overwrite(Bpe.mergesDf(spark, trained))
    }
    memo.computeIfAbsent(h.path, _ =>
      h.read(spark).collect()
        .map(r => Bpe.Merge(r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(4)))
        .sortBy(_.rank).toSeq)
  }

  /** The stored merge table as a DataFrame, for the trainer query. */
  def mergesDf(spark: SparkSession, sfDir: String, table: String,
      textCol: String, k: Int, cap: Int): DataFrame =
    Bpe.mergesDf(spark, merges(spark, sfDir, table, textCol, k, cap))
}
