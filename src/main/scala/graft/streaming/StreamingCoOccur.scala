package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.CoOccurStore

/** The stored co-occurrence graph's INGEST as a stream — the
  * streaming front door of `operators/CoOccurStore`: (group, item)
  * rows arrive continuously, every micro-batch LANDS as an immutable
  * corpus file, and the landed corpus is maintained by THE BATCH
  * ARTIFACT ITSELF. Round 13's sink kept its own `_batch=` partition
  * layout outside the store — which meant its own replay algebra, no
  * lease/rollback/time-travel guardrails, and a per-batch pre-view
  * that scanned ALL prior ingested rows unclustered (O(history) per
  * batch, growing with sink age). Promoting batches to corpus
  * GENERATIONS deletes that whole parallel plane: one delta algebra
  * ([[CoOccurStore.pairDeltaOf]] via the artifact's advance), one
  * fold (the store's g-clustered compaction — the In(affected-groups)
  * pre-view pushdown actually prunes row groups, so per-batch cost is
  * O(batch + affected + since-last-fold), FLAT in sink age), one
  * ops surface (writer lease, suffix rollback of bad batches,
  * `serveVersion` time travel, `maint_*` observability), and the
  * stored GRAPH STATE (coreness / community labels) serves over a
  * streamed corpus exactly as over a batch one.
  *
  * Landing protocol (exactly-once at the FILE level under
  * at-least-once batch delivery):
  *
  *  - the batch stages under `outDir/_staging/b<id>/` (OUTSIDE the
  *    corpus directory — the artifact's ledger walks the corpus, and
  *    a half-staged file must never look like a corpus entry), hash-
  *    partitioned by `g` into a FIXED part count — deterministic
  *    row→file assignment for the same batch content;
  *  - each staged part renames (atomic, same filesystem) to the
  *    deterministic corpus name `b<batchId>_p<partIdx>.parquet`,
  *    SKIPPING names that already exist: a replayed batch re-stages
  *    (cheap, batch-sized) and lands only what a crash left missing —
  *    per name the content is identical, so counts can never inflate;
  *  - the corpus file's appearance is what commits the rows: the
  *    artifact's reconcile sees a pure file append and advances
  *    O(batch + affected groups), the ledger rename being the real
  *    commit point (a crash mid-advance replays deterministically —
  *    the artifact's own contract).
  *
  * A reconcile that races a multi-part landing sees a PREFIX of the
  * batch's files — just a smaller generation; the rest lands as the
  * next one. That is the cross-generation group problem the store's
  * delta algebra exists for, so correctness is unaffected (spec-
  * pinned, including replay across a fold).
  *
  * Serving reads the store's fold-state-aware path (a fully-folded
  * sink serves with zero aggregate exchange); corpus columns are
  * normalized to (g, i) at landing so serves need no column names.
  */
object StreamingCoOccur {

  /** Corpus column names are FIXED at landing — the sink's serves are
    * addressed by outDir alone.
    */
  private val G = "g"
  private val I = "i"

  private def corpusDir(outDir: String): String = s"$outDir/corpus"

  private def hasCorpus(outDir: String): Boolean = {
    val p = Paths.get(corpusDir(outDir))
    Files.exists(p) && {
      val s = Files.list(p)
      try s.anyMatch(f => f.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
  }

  private def requireCorpus(outDir: String): String = {
    if (!hasCorpus(outDir)) throw new IllegalStateException(
      s"no ingested co-occurrence batches under $outDir — start the " +
        "stream (or point at its outDir) before serving")
    corpusDir(outDir)
  }

  private def deleteTree(dir: Path): Unit =
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally s.close()
    }

  /** Land one batch as corpus files + run the ingest tick. This is
    * the micro-batch body of [[start]] and ALSO the manual-ingest
    * door: a bulk backfill (or a harness probe) can push numbered
    * batches through the identical landing/replay protocol without a
    * streaming query. Batch ids must be unique per sink and a replay
    * must carry the same id with the same content — exactly the
    * foreachBatch contract.
    *
    * @param parts files per batch (fixed — determinism of the
    *   row→file assignment under replay depends on it). 1 is right
    *   for micro-batch-sized inputs; raise it for bulk backfills.
    */
  def applyBatch(batch: DataFrame, batchId: Long,
      gCol: String, iCol: String, outDir: String, parts: Int = 1): Unit = {
    // an empty batch lands nothing — and on a FRESH sink must not
    // create an empty corpus dir whose first tick has no schema
    if (batch.isEmpty) return
    landBatch(batch, batchId, gCol, iCol, outDir, parts)
    CoOccurStore.ingestTick(batch.sparkSession, corpusDir(outDir), G, I)
  }

  /** The landing step alone (no tick) — spec hook for simulating a
    * crash between the file landing and the artifact advance, and for
    * partial landings (`keepParts` keeps only the first k staged
    * files — a crash mid-rename).
    */
  private[streaming] def landBatch(batch: DataFrame, batchId: Long,
      gCol: String, iCol: String, outDir: String, parts: Int,
      keepParts: Int = Int.MaxValue): Unit = {
    require(parts >= 1, s"parts must be >= 1, got $parts")
    val corpus = Paths.get(corpusDir(outDir))
    Files.createDirectories(corpus)
    val staging = Paths.get(outDir, "_staging", s"b$batchId")
    deleteTree(staging) // stale debris from a crashed attempt
    batch.select(col(gCol).as(G), col(iCol).as(I))
      .repartition(parts, col(G))
      .write.mode("overwrite").parquet(staging.toString)
    // deterministic names by SPARK part index (parsed from the task's
    // own part-NNNNN prefix — empty partitions write no file, and the
    // index, not the listing position, is what replay reproduces)
    val s = Files.list(staging)
    val staged =
      try s.toArray.toSeq.map(_.asInstanceOf[Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(_.getFileName.toString)
      finally s.close()
    staged.take(keepParts).foreach { f =>
      val idx = f.getFileName.toString.stripPrefix("part-")
        .takeWhile(_.isDigit)
      require(idx.nonEmpty, s"unexpected staged file name $f")
      val target = corpus.resolve(f"b$batchId%09d_p${idx.toInt}%d.parquet")
      if (!Files.exists(target))
        Files.move(f, target, StandardCopyOption.ATOMIC_MOVE)
    }
    deleteTree(staging)
  }

  def start(rows: DataFrame, gCol: String, iCol: String,
      outDir: String, checkpoint: String, trigger: Trigger): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) applyBatch(batch, batchId, gCol, iCol, outDir)
        ()
      }
      .start()

  /** The served edge counts at the caller's cut (serve-side
    * threshold, one sink serves every cut) — the store's fold-state-
    * aware read: live delta partials sum at read, a fully-folded sink
    * skips the sum. Refuses with the actual cause when nothing has
    * been ingested.
    */
  def weightedEdges(spark: SparkSession, outDir: String,
      minCount: Long): DataFrame =
    CoOccurStore.weightedEdgesAt(spark, requireCorpus(outDir), G, I,
      minCount)

  /** The stored k-core fixpoint over the streamed corpus — the
    * q75-equivalent serve (same stored piece, same incremental
    * advance, because it IS the same artifact machinery).
    */
  def coreness(spark: SparkSession, outDir: String): DataFrame =
    CoOccurStore.corenessAt(spark, requireCorpus(outDir), G, I)

  /** The stored community labels over the streamed corpus — the
    * q76-equivalent serve.
    */
  def communities(spark: SparkSession, outDir: String): DataFrame =
    CoOccurStore.communitiesAt(spark, requireCorpus(outDir), G, I)

  /** Fold the sink's accumulated delta generations now (offline
    * compaction — also runs automatically on the store's cadence).
    */
  def compact(spark: SparkSession, outDir: String): Unit =
    CoOccurStore.compact(spark, requireCorpus(outDir), G, I)

  /** Join any in-flight detached fold — determinism hook. */
  def awaitMaintenance(outDir: String): Unit =
    if (hasCorpus(outDir))
      CoOccurStore.awaitMaintenance(corpusDir(outDir), G, I)
}
