package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.CoOccurStore
import graft.sources.CorpusLanding

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
  * Landing is [[graft.sources.CorpusLanding]] — the shared
  * micro-batch → corpus-generation protocol (deterministic
  * `b<id>_p<k>of<parts>.parquet` names hash-partitioned by `g`,
  * rename-if-absent, parts-mismatch refusal): exactly-once at the
  * file level under at-least-once delivery, and the corpus file's
  * appearance is what commits the rows (the artifact's reconcile
  * sees a pure file append and advances O(batch + affected groups)).
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


  /** Refuse an outDir written by the pre-round-14 sink format (its
    * own `gi/` + `pairparts/` `_batch=` partitions): silently serving
    * only post-upgrade corpus batches would drop the legacy history.
    */
  private def requireNotLegacy(outDir: String): Unit =
    if (Files.exists(Paths.get(outDir, "gi")) ||
        Files.exists(Paths.get(outDir, "pairparts")))
      throw new IllegalStateException(
        s"$outDir holds a legacy _batch-partitioned co-occurrence " +
          "sink (pre-corpus-landing format); serving or ingesting " +
          "through the new path would silently exclude its history — " +
          "run migrateLegacy(spark, legacyDir, freshDir) to replay it " +
          "through the corpus-landing door into a fresh outDir, then " +
          "point ingest and serves there (the old tree is left " +
          "read-only)")

  /** Replay a pre-round-14 `_batch=`-partitioned sink's history into
    * a FRESH new-format sink, through the real door: each legacy
    * batch's (g, i) rows land through [[CorpusLanding]] under its
    * original batch id, in batch-id order — so the migrated corpus is
    * exactly what the same stream ingested through the current
    * protocol would have produced, and every serve (edges, coreness,
    * communities, time travel, rollback) holds over it.
    *
    * THE ADVANCE IS BATCHED: all legacy batches land FIRST (pure file
    * ops through the landing protocol), then ONE catch-up tick
    * advances the artifact over the whole landed history — the
    * store's delta algebra handles a multi-generation catch-up as one
    * generation (the same contract a crash between landing and
    * advance already relies on), so a years-old sink with 10⁴-10⁵
    * micro-batches pays one advance instead of 10⁴-10⁵ sequential
    * ~1-2 s ticks (measured r15: hours-to-days of replay collapsed to
    * the one advance — `probe_migrate_batch`). `tickEveryBatch=true`
    * keeps the original per-batch door — the equivalence spec pins
    * that both routes serve identically, which is what makes the
    * batched default safe to trust.
    *
    * Idempotent and resumable BY the landing protocol: a crashed or
    * re-run migration re-lands only the files a previous attempt left
    * missing (same ids, same content, same deterministic names), and
    * the artifact ticks are replay-exact by the store's contract. The
    * legacy tree is never written to.
    *
    * REFUSES a freshDir that already holds batches NOT from this
    * migration (a `_migrated_from` marker, stamped before the first
    * landing, is the proof): the landing protocol's skip-if-exists
    * rule assumes same-content replays, so migrating into a sink that
    * ingested its own batches under colliding ids would silently drop
    * legacy rows in favor of whatever landed first. The emptiness
    * precondition is RE-CHECKED after winning the marker stamp (the
    * stamp's created flag proves this call owned the transition), so
    * a direct ingest racing the check-then-stamp window is refused
    * instead of absorbed — the one window left open is a direct
    * ingest AFTER the stamp, which is the documented operator
    * contract: do not run concurrent writers into a sink mid-
    * migration. Post-migration ingest into the migrated sink is fine
    * — batch ids must simply continue past the legacy ids, the
    * sink's standing uniqueness contract.
    */
  def migrateLegacy(spark: SparkSession, legacyDir: String,
      freshDir: String, tickEveryBatch: Boolean = false): Unit = {
    CorpusLanding.requireLocal(legacyDir)
    CorpusLanding.requireLocal(freshDir)
    require(Files.exists(Paths.get(legacyDir, "gi")),
      s"$legacyDir has no legacy gi/ table — nothing to migrate")
    requireNotLegacy(freshDir)
    val marker = Paths.get(freshDir, "_migrated_from")
    if (CorpusLanding.hasData(corpusDir(freshDir)) &&
        !Files.exists(marker))
      throw new IllegalStateException(
        s"$freshDir already holds landed batches that did not come " +
          "from a migration (no _migrated_from marker) — replaying " +
          "legacy batches into it could silently lose rows under " +
          "colliding batch ids; migrate into an empty outDir")
    val (stamped, created) =
      CorpusLanding.stampMarkerCreated(marker, legacyDir)
    if (stamped != legacyDir) throw new IllegalStateException(
      s"$freshDir was migrated from $stamped — refusing to interleave " +
        s"a second migration from $legacyDir (colliding batch ids " +
        "would silently drop rows); use a separate outDir")
    // close the check→stamp race: created=true proves the marker was
    // OURS to create, so any data visible NOW landed through a
    // concurrent direct ingest in the window after the emptiness
    // check — those batches are not from a migration and replaying
    // over them could collide. Refuse and surface; the marker this
    // refused attempt stamped must be removed by hand (deleting it
    // here could un-publish a marker a concurrently resuming
    // migration from the same legacyDir has already read).
    if (created && CorpusLanding.hasData(corpusDir(freshDir)))
      throw new IllegalStateException(
        s"a concurrent writer landed batches into $freshDir between " +
          "the emptiness check and the marker stamp — refusing to " +
          "replay over them (colliding batch ids would silently drop " +
          s"rows); inspect the sink, remove ${marker} if abandoning " +
          "it, and migrate into an outDir with no concurrent writers")
    val gi = spark.read.parquet(s"$legacyDir/gi")
    // partition-column types are inferred (small ids read back as
    // ints) — normalize before comparing against the landed batch ids
    val batchIds = gi.select(col("_batch").cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted
    if (tickEveryBatch)
      batchIds.foreach { b =>
        applyBatch(
          gi.where(col("_batch").cast("long") === b).select(G, I),
          b, G, I, freshDir)
      }
    else {
      // every distinct _batch value has rows by construction — land
      // without the per-batch emptiness action, tick once at the end
      batchIds.foreach { b =>
        landBatch(
          gi.where(col("_batch").cast("long") === b).select(G, I),
          b, G, I, freshDir, parts = 1)
      }
      if (batchIds.nonEmpty)
        CoOccurStore.ingestTick(spark, corpusDir(freshDir), G, I)
    }
  }

  private def corpusDir(outDir: String): String = s"$outDir/corpus"

  private def hasCorpus(outDir: String): Boolean =
    CorpusLanding.hasData(corpusDir(outDir))

  private def requireCorpus(outDir: String): String = {
    CorpusLanding.requireLocal(outDir)
    requireNotLegacy(outDir)
    if (!hasCorpus(outDir)) throw new IllegalStateException(
      s"no ingested co-occurrence batches under $outDir — start the " +
        "stream (or point at its outDir) before serving")
    corpusDir(outDir)
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
    CorpusLanding.requireLocal(outDir)
    requireNotLegacy(outDir)
    CorpusLanding.land(
      batch.select(col(gCol).as(G), col(iCol).as(I)),
      batchId, corpusDir(outDir), hashCol = G, parts = parts,
      keepParts = keepParts)
  }

  def start(rows: DataFrame, gCol: String, iCol: String,
      outDir: String, checkpoint: String, trigger: Trigger): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // applyBatch owns the emptiness check — one action per batch
        applyBatch(batch, batchId, gCol, iCol, outDir)
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
