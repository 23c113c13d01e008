package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.Piece

/** Persisted prefix index for EXACT-Jaccard batch ingest screening —
  * the guaranteed-no-false-negative counterpart of [[BandStore]]
  * (probabilistic near) and [[DigestStore]] (exact full-text): an
  * incoming batch is screened against the stored corpus and every
  * corpus document with word-set Jaccard >= tau is reported, exactly.
  *
  * The subtlety an incremental prefix index must solve: the prefix
  * theorem needs ONE total token order shared by index and probe,
  * but the rarest-first order drifts as the corpus grows. The store's
  * answer is the engine's pinned-piece contract: the (token, df)
  * table is FROZEN at full build ("order", pinned) and both the
  * stored prefix entries and every probe derive their sort keys from
  * it — tokens unseen at build time get df 0 (sort first, maximally
  * conservative prefixes). Any FIXED total order preserves the
  * theorem, so exactness never depends on freshness; staleness costs
  * only candidate-volume efficiency, and a rebuild (any non-append
  * corpus change, or offline compaction cadence) re-freezes the
  * order at current frequencies.
  *
  * Pieces: `order` (pinned), `sets` (additive — interned 64-bit
  * token hashes + set size per doc, the verify side), `prefix`
  * (additive — (doc_id, sz, pos, k) entries derived from the pinned
  * order, clustered by key so the probe join reads presorted runs).
  * A corpus file append advances `sets`/`prefix` over only the new
  * files: O(new) per increment.
  */
object PrefixStore {

  private def toks(text: Column): Column =
    array_distinct(split(TextFunctions.normalize(text), " "))

  /** Sort key under a frozen (df asc, token asc) order; unseen
    * tokens coalesce to df 0.
    */
  private[dedup] def prefixEntries(docs: DataFrame, idCol: String,
      text: Column, order: DataFrame, tauNum: Int, tauDen: Int): DataFrame = {
    val id = col(idCol)
    val exploded = docs.select(id, toks(text).as("toks"))
      .select(id, explode(col("toks")).as("tok"))
    val keyed = exploded.join(order, Seq("tok"), "left")
      .select(id, concat(lpad(coalesce(col("df"), lit(0L)).cast("string"),
        10, "0"), lit("|"), col("tok")).as("k"))
    val ordered = keyed.groupBy(idCol)
      .agg(sort_array(collect_list(col("k"))).as("ks"))
      .select(id, col("ks"), size(col("ks")).as("sz"))
    val prefLen = (col("sz") - floor((col("sz") * tauNum + (tauDen - 1))
      / tauDen) + 1).cast("int")
    ordered
      .select(id, col("sz"),
        posexplode(slice(col("ks"), lit(1), prefLen)).as(Seq("p0", "k")))
      .select(id, col("sz"), (col("p0") + 1).as("pos"), col("k"))
  }

  private def interned(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), transform(toks(col("text")),
        t => xxhash64(t)).as("ht"))
      .select(col("doc_id"), col("ht"), size(col("ht")).as("n"))

  private def byKey(df: DataFrame): DataFrame =
    df.repartition(col("k")).sortWithinPartitions("k")

  private def handle(corpusPath: String, tauNum: Int, tauDen: Int) =
    IncrementalDocArtifact(corpusPath, s"prefix${tauNum}_$tauDen", Seq(
      Piece("order",
        (docs, _) => docs.select(explode(toks(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("df")),
        pinned = true),
      Piece("sets", (docs, _) => interned(docs)),
      Piece("prefix",
        (docs, ctx) => byKey(prefixEntries(docs, "doc_id", col("text"),
          ctx.stored("order"), tauNum, tauDen)),
        fold = Some(byKey))))

  /** All (new_id, dup_id, jaccard) pairs between `batch` docs and
    * stored corpus docs with word-set Jaccard >= tauNum/tauDen —
    * exact, no false negatives. The batch derives its prefixes under
    * the STORED frozen order; candidates are a batch-prefix ⋈
    * stored-prefix equi-join (+ length and positional filters in
    * exact integers); verify intersects the stored interned sets.
    * `corpusFilter` restricts the stored side (test harness hook).
    */
  def screen(spark: SparkSession, sfDir: String, table: String,
      batch: DataFrame, idCol: String, tauNum: Int, tauDen: Int,
      corpusFilter: Column = lit(true)): DataFrame = {
    val h = handle(s"$sfDir/$table.parquet", tauNum, tauDen)
    val order = h.serve(spark, "order")
    val storedPref = h.serve(spark, "prefix").filter(corpusFilter)
      .select(col("doc_id").as("dup_id"), col("sz").as("sz_d"),
        col("pos").as("pos_d"), col("k"))
    val storedSets = h.serve(spark, "sets").filter(corpusFilter)
      .select(col("doc_id").as("dup_id"), col("ht").as("hd"), col("n").as("nd"))
    val bp = prefixEntries(batch, idCol, col("text"), order, tauNum, tauDen)
      .select(col(idCol).as("new_id"), col("sz").as("sz_n"),
        col("pos").as("pos_n"), col("k"))
    val cand = bp.join(storedPref, "k")
      .where(least(col("sz_n"), col("sz_d")) * tauDen >=
        greatest(col("sz_n"), col("sz_d")) * tauNum)
      .where((lit(1) + least(col("sz_n") - col("pos_n"),
        col("sz_d") - col("pos_d"))) * (tauNum + tauDen) >=
        (col("sz_n") + col("sz_d")) * tauNum)
      .select(col("new_id"), col("dup_id")).distinct()
    val batchSets = batch.select(col(idCol).as("new_id"),
      transform(toks(col("text")), t => xxhash64(t)).as("hn"))
      .select(col("new_id"), col("hn"), size(col("hn")).as("nn"))
    val inter = size(array_intersect(col("hn"), col("hd")))
    val union = col("nn") + col("nd") - inter
    cand
      .join(batchSets, "new_id")
      .join(storedSets, "dup_id")
      .where(inter * tauDen >= union * tauNum)
      .select(col("new_id"), col("dup_id"),
        round(inter.cast("double") / union, 4).as("jaccard"))
  }

  /** Offline compaction hook (also re-freezes nothing — the order is
    * pinned until the next full rebuild).
    */
  def compact(spark: SparkSession, corpusPath: String,
      tauNum: Int, tauDen: Int): Unit =
    handle(corpusPath, tauNum, tauDen).compact(spark)

  // ---------------------------------------------------------------
  // STORE-SERVED whole-corpus forms of d23/d25: contraction derives
  // at serve time from the stored pieces — reps are one tiny
  // group-by over the interned `sets` piece (identical ht arrays =
  // identical token sets, the same md5-fp contraction PrefixJoin
  // does inline), and rep-level prefix entries are just the stored
  // entries of the rep ids (identical sets produce identical
  // frozen-order entries). Tokenization, df aggregation, and
  // per-doc sorting never re-run once the artifact exists.
  // ---------------------------------------------------------------

  private def repTables(spark: SparkSession, sfDir: String, table: String,
      tauNum: Int, tauDen: Int): (DataFrame, DataFrame, DataFrame) = {
    val h = handle(s"$sfDir/$table.parquet", tauNum, tauDen)
    val sets = h.serve(spark, "sets").localCheckpoint()
    val prefix = h.serve(spark, "prefix")
    val reps = sets.groupBy("ht", "n").agg(min("doc_id").as("rid"))
      .localCheckpoint()
    val members = sets.select(col("doc_id").as("mid"), col("ht"))
    val repPref = prefix.join(
      reps.select(col("rid").as("doc_id")), "doc_id").localCheckpoint()
    (reps, members, repPref)
  }

  private def repPairs(reps: DataFrame, repPref: DataFrame,
      tauNum: Int, tauDen: Int): DataFrame = {
    val a = repPref.select(col("doc_id").as("rid_a"), col("sz").as("sz_a"),
      col("pos").as("pos_a"), col("k"))
    val b = repPref.select(col("doc_id").as("rid_b"), col("sz").as("sz_b"),
      col("pos").as("pos_b"), col("k"))
    val cand = a.join(b, "k")
      .where(col("rid_a") < col("rid_b"))
      .where(least(col("sz_a"), col("sz_b")) * tauDen >=
        greatest(col("sz_a"), col("sz_b")) * tauNum)
      .where((lit(1) + least(col("sz_a") - col("pos_a"),
        col("sz_b") - col("pos_b"))) * (tauNum + tauDen) >=
        (col("sz_a") + col("sz_b")) * tauNum)
      .select(col("rid_a"), col("rid_b")).distinct()
    val inter = size(array_intersect(col("ha"), col("hb")))
    val union = col("na") + col("nb") - inter
    cand
      .join(reps.select(col("rid").as("rid_a"), col("ht").as("ha"),
        col("n").as("na")), "rid_a")
      .join(reps.select(col("rid").as("rid_b"), col("ht").as("hb"),
        col("n").as("nb")), "rid_b")
      .where(inter * tauDen >= union * tauNum)
      .select(col("rid_a"), col("rid_b"), col("ha"), col("hb"),
        round(inter.cast("double") / union, 4).as("jaccard"))
  }

  /** d23's output served from the store: all (id_a < id_b) pairs
    * with word-set Jaccard >= tau over the WHOLE stored corpus.
    */
  def similarPairs(spark: SparkSession, sfDir: String, table: String,
      tauNum: Int, tauDen: Int): DataFrame = {
    val (reps, members, repPref) = repTables(spark, sfDir, table, tauNum, tauDen)
    val rp = repPairs(reps, repPref, tauNum, tauDen)
    val cross = rp
      .join(members.select(col("ht").as("ha"), col("mid").as("ma")), "ha")
      .join(members.select(col("ht").as("hb"), col("mid").as("mb")), "hb")
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("jaccard"))
    val within = PairGen.pairsWithin(members, Seq("ht"), col("mid"))
      .select(col("a").as("id_a"), col("b").as("id_b"), lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }

  /** d25's output served from the store: exact near-dup clusters
    * (min-reachable-id labels), CC on the contracted rep graph.
    */
  def clusters(spark: SparkSession, sfDir: String, table: String,
      tauNum: Int, tauDen: Int): DataFrame = {
    val (reps, members, repPref) = repTables(spark, sfDir, table, tauNum, tauDen)
    val rp = repPairs(reps, repPref, tauNum, tauDen)
    val labels = DupClusters.componentsAlternating(
      reps.select(col("rid")), "rid",
      rp.select(col("rid_a"), col("rid_b")), "rid_a", "rid_b")
    members
      .join(reps.select(col("ht"), col("rid")), "ht")
      .join(labels, "rid")
      .select(col("mid").as("doc_id"), col("cluster_id"))
  }

  // ---------------------------------------------------------------
  // Containment screening: |batch ∩ stored| / |batch| >= tau — the
  // asymmetric form that catches a new document mostly CONTAINED in
  // a stored one (boilerplate-wrapped copies, quote-heavy rewrites)
  // which symmetric Jaccard misses when the stored doc is much
  // larger. The prefix theorem needs no order on the INDEX side
  // here: if |a∩b| >= ceil(tau·|a|), then a's prefix (|a| −
  // ceil(tau·|a|) + 1 rarest tokens) cannot avoid b — tokens of a
  // outside b number at most |a| − ceil(tau·|a|). So the store keeps
  // a FULL postings piece (the honest index cost of containment) and
  // only the probe derives frozen-order prefixes.
  // ---------------------------------------------------------------

  private def containHandle(corpusPath: String, tauNum: Int, tauDen: Int) =
    IncrementalDocArtifact(corpusPath, s"contain${tauNum}_$tauDen", Seq(
      Piece("order",
        (docs, _) => docs.select(explode(toks(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("df")),
        pinned = true),
      Piece("sets", (docs, _) => interned(docs)),
      Piece("postings",
        (docs, _) => docs.select(col("doc_id"), toks(col("text")).as("toks"))
          .select(col("doc_id"), size(col("toks")).as("sz"),
            explode(col("toks")).as("tok"))
          .repartition(col("tok")).sortWithinPartitions("tok"),
        fold = Some(df => df.repartition(col("tok"))
          .sortWithinPartitions("tok")))))

  /** All (new_id, dup_id, containment) with
    * |batch-set ∩ stored-set| / |batch-set| >= tauNum/tauDen — exact,
    * no false negatives. Candidates: the probe's frozen-order prefix
    * tokens against the stored FULL postings (|b| >= ceil(tau·|a|)
    * length filter in exact integers); verify on interned sets.
    */
  def screenContainment(spark: SparkSession, sfDir: String, table: String,
      batch: DataFrame, idCol: String, tauNum: Int, tauDen: Int,
      corpusFilter: Column = lit(true)): DataFrame = {
    val h = containHandle(s"$sfDir/$table.parquet", tauNum, tauDen)
    val order = h.serve(spark, "order")
    val postings = h.serve(spark, "postings").filter(corpusFilter)
      .select(col("doc_id").as("dup_id"), col("sz").as("sz_d"), col("tok"))
    val storedSets = h.serve(spark, "sets").filter(corpusFilter)
      .select(col("doc_id").as("dup_id"), col("ht").as("hd"))
    // probe prefixes under the frozen order; raw token rides along as
    // the postings join key
    // k = lpad(df,10)|token → the raw token starts at char 12 (tokens
    // may themselves contain '|', so no delimiter split)
    val bp = prefixEntries(batch, idCol, col("text"), order, tauNum, tauDen)
      .select(col(idCol).as("new_id"), col("sz").as("sz_n"),
        col("k").substr(lit(12), length(col("k"))).as("tok"))
    val cand = bp.join(postings, "tok")
      .where(col("sz_d") * tauDen >= col("sz_n") * tauNum)
      .select(col("new_id"), col("dup_id")).distinct()
    val batchSets = batch.select(col(idCol).as("new_id"),
      transform(toks(col("text")), t => xxhash64(t)).as("hn"))
      .select(col("new_id"), col("hn"), size(col("hn")).as("nn"))
    val inter = size(array_intersect(col("hn"), col("hd")))
    cand
      .join(batchSets, "new_id")
      .join(storedSets, "dup_id")
      .where(inter * tauDen >= col("nn") * tauNum)
      .select(col("new_id"), col("dup_id"),
        round(inter.cast("double") / col("nn"), 4).as("containment"))
  }
}
