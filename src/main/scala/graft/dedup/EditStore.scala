package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.Piece

/** Persisted edit-distance ingest screen — the short-string rung of
  * the stored-screen family ([[DigestStore]] exact full-text,
  * [[BandStore]] probabilistic near, [[PrefixStore]] exact set-Jaccard
  * + containment): an incoming batch of names/titles/URLs is checked
  * against the stored corpus and every corpus string within
  * Levenshtein `k` is reported, exactly.
  *
  * The index side of [[EditJoin]]'s pigeonhole is PER-STRING — each
  * string contributes its segments and probe substrings
  * independently — so unlike the prefix index there is no frozen
  * global order to maintain: all three pieces are purely additive
  * and a corpus file append advances O(new) with no staleness
  * subtlety at all.
  *
  * The pigeonhole probe looks DOWN in length (a probe string
  * enumerates indexable lengths [l−k, l]), so one orientation alone
  * would miss corpus partners LONGER than the batch string. The
  * store therefore keeps BOTH sides of the dictionary:
  *
  *  - `segs` (sid, l_a, i, seg) — the corpus's positioned segments;
  *    batch PROBES join against it (finds partners ≤ batch length);
  *  - `probes` (sid, l_a, i, seg) — the corpus's probe substrings
  *    (≤ (k+1)²(2k+1) per string, a constant); batch SEGMENTS join
  *    against it (finds partners ≥ batch length);
  *  - `strs` (sid, s, l) — the verify side.
  *
  * Per-screen work is O(batch × fan-out) join probes against
  * seg-clustered stored pieces — never O(corpus).
  */
object EditStore {

  private def withLen(strs: DataFrame, idCol: String, strCol: Column) =
    strs.select(col(idCol).as("sid"), strCol.as("s"))
      .select(col("sid"), col("s"), length(col("s")).cast("int").as("l"))

  private def bySeg(df: DataFrame): DataFrame =
    df.repartition(col("seg")).sortWithinPartitions("seg")

  /** `variant` keys the artifact: the same corpus table can carry
    * several screened string columns (one artifact each).
    */
  private def handle(corpusPath: String, variant: String, idCol: String,
      strCol: Column, k: Int) =
    IncrementalDocArtifact(corpusPath, s"edit${k}_$variant", Seq(
      Piece("strs", (docs, _) => withLen(docs, idCol, strCol)),
      Piece("segs",
        (docs, _) => bySeg(EditJoin.segmentsOf(
          withLen(docs, idCol, strCol), k)),
        fold = Some(bySeg)),
      Piece("probes",
        (docs, _) => bySeg(EditJoin.probesOf(
            withLen(docs, idCol, strCol), k)
          .select(col("sid"), col("l_a"), col("i"), col("seg"))),
        fold = Some(bySeg))))

  /** All (new_id, dup_id, dist) pairs between `batch` strings and
    * stored corpus strings with levenshtein <= k — exact, no false
    * negatives (the pigeonhole can only ADD candidates; verify is
    * the real distance). The corpus side derives `s` from
    * `corpusStrCol` over the raw table at `corpusPath` (built into
    * the artifact once, advanced O(new)); the batch side derives
    * from `batchStrCol`. `corpusFilter` restricts the stored side
    * and sees the artifact's columns (`sid`, ...).
    */
  def screen(spark: SparkSession, corpusPath: String, variant: String,
      idCol: String, corpusStrCol: Column,
      batch: DataFrame, batchIdCol: String, batchStrCol: Column, k: Int,
      corpusFilter: Column = lit(true)): DataFrame = {
    val h = handle(corpusPath, variant, idCol, corpusStrCol, k)
    val segs = h.serve(spark, "segs").filter(corpusFilter)
      .select(col("sid").as("dup_id"), col("l_a"), col("i"), col("seg"))
    val strs = h.serve(spark, "strs").filter(corpusFilter)
      .select(col("sid").as("dup_id"), col("s").as("s_d"))
    val b = withLen(batch, batchIdCol, batchStrCol)
    val probes = EditJoin.probesOf(b, k)
      .select(col("sid").as("new_id"), col("l_a"), col("i"), col("seg"))
    val cand = probes.join(segs, Seq("l_a", "i", "seg"))
      .select(col("new_id"), col("dup_id")).distinct()
    // symmetric orientation for corpus partners LONGER than the
    // batch string: batch segments against the STORED probe piece
    val bSegs = EditJoin.segmentsOf(b, k)
      .select(col("sid").as("new_id"), col("l_a"), col("i"), col("seg"))
    val storedProbes = h.serve(spark, "probes").filter(corpusFilter)
      .select(col("sid").as("dup_id"), col("l_a"), col("i"), col("seg"))
    val cand2 = bSegs.join(storedProbes, Seq("l_a", "i", "seg"))
      .select(col("new_id"), col("dup_id")).distinct()
    cand.unionByName(cand2).distinct()
      .join(b.select(col("sid").as("new_id"), col("s").as("s_n")), "new_id")
      .join(strs, "dup_id")
      .withColumn("dist", levenshtein(col("s_n"), col("s_d")).cast("long"))
      .where(col("dist") <= k)
      .select(col("new_id"), col("dup_id"), col("dist"))
  }

  /** Offline compaction hook. */
  def compact(spark: SparkSession, corpusPath: String, variant: String,
      idCol: String, corpusStrCol: Column, k: Int): Unit =
    handle(corpusPath, variant, idCol, corpusStrCol, k).compact(spark)
}
