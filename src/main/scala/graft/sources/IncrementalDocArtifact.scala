package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, lit, row_number}

/** Generic incremental maintenance for derived artifacts — the
  * base+delta ledger discipline `TextIndexStore` proved, extracted so
  * derived artifacts get O(new)-cost increments instead of full
  * rebuilds. The engine owns the layout, staleness reconciliation,
  * replay safety and compaction; callers supply the per-piece builders.
  *
  * Three piece kinds cover the three classes of derived artifact:
  *
  *  - [[Piece]] (ADDITIVE): rows derive per-document (postings,
  *    quality scores, signatures, codes) — an increment builds rows
  *    over only the new files and the artifact is the plain union of
  *    base and deltas. Additivity contract: build(subset) unioned
  *    across subsets ≡ build(whole), with additive partials folded at
  *    read where needed (the stats trick).
  *  - [[Piece]] with `pinned = true` (TRAINED): a whole-corpus
  *    artifact that increments deliberately do NOT touch — codebooks,
  *    subquantizers, any trained model. Built at full (re)build only;
  *    appends reuse it unchanged (the fixed-codebook production
  *    contract: encode new data with the versioned books, retrain
  *    offline into a fresh artifact when drift warrants).
  *  - [[MergePiece]] (KEYED UPSERT): a GLOBAL result a new document
  *    can change for old rows too (duplicate-cluster labels, any
  *    fixpoint over the corpus graph) — an increment computes only the
  *    CHANGED keyed rows against the pre-increment views and reads
  *    resolve last-writer-wins by generation sequence. Upsert
  *    contract: within one generation each key appears at most once,
  *    and (pre-increment views + changed rows) ≡ a full rebuild.
  *
  * Builders receive an [[AdvanceCtx]] and may read OTHER pieces
  * through it: at full rebuild, pieces build in declaration order
  * (additive/pinned first, then merges) and see the pieces rebuilt
  * before them; at an increment, every view excludes the generations
  * being caught up (crash replay reads identical inputs). That is how
  * a codes piece encodes with the pinned books, and how cluster labels
  * probe the stored signature table.
  *
  * LAZY MERGE MODE (`lazyMerges = true`): a corpus append advances
  * only the additive pieces — the screen-only front door stays
  * O(new-additive) — and the merge pieces (pairs, labels, any global
  * result) catch up ON FIRST READ after the append, as ONE combined
  * increment over every entry they have not yet reflected. Soundness
  * rests on two engine invariants: (a) merge advances are
  * generation-chunking invariant (one advance over k appended file
  * sets ≡ k chained advances — the documented [[MergePiece]] contract,
  * asserted for every registered store in
  * `IncrementalChunkingParitySpec`), and (b) the catch-up's
  * pre-increment views exclude exactly the committed generations the
  * piece has not covered (tracked per piece in a `covered` ledger; the
  * per-generation entry lists live in `_gens/`). Compaction first
  * catches merges up, then folds — so gen-level exclusion never meets
  * a folded-away generation.
  *
  * Layout, per (corpus path, artifact key):
  *
  *   root/<pathKey>_<key>/state          corpus DATA-file ledger +
  *                                       `#v2` footer: committed gen
  *                                       ids and per-piece base
  *                                       snapshot versions
  *   root/<pathKey>_<key>/_gens/<g>      entry list of generation <g>
  *   root/<pathKey>_<key>/<piece>/base   versioned-pointer snapshot
  *   root/<pathKey>_<key>/<piece>/delta/_gen=<g>/  one immutable
  *                                       partition per corpus increment
  *                                       (merge pieces also carry a
  *                                       monotone `_seq` column; base
  *                                       rows rank as seq −1)
  *   root/<piece>/covered                merge-piece coverage ledger
  *                                       (lazy mode)
  *
  * Reconciliation per read: ledger == listing and base versions match
  * the footer → serve (after dropping UNCOMMITTED delta generations —
  * a crashed advance whose corpus files were then reverted must not
  * serve its orphan rows, and a crashed rebuild whose corpus was
  * reverted keys a rebuild via the base-version mismatch); pure file
  * append → advance each piece into a deterministic `_gen` partition
  * (replay overwrites itself — every advance reads views that EXCLUDE
  * the generation being written, so a crashed half-write can never
  * leak into its own recomputation), advance the ledger by atomic
  * rename LAST; anything else → full rebuild, deltas cleared — an
  * in-place regrown corpus can never serve stale rows. Compaction
  * folds deltas into the base via the pointer commit on the
  * `compactEvery` cadence or on demand — CRASH-ATOMICALLY: the
  * folded-gen list publishes inside the base version in the same
  * pointer flip as the folded data, so absorbed partitions are dead
  * by marker even if their physical deletion (mere GC) never ran.
  *
  * Concurrency contract: mutation (reconcile, compact) is synchronized
  * per handle per JVM; ACROSS processes the design is single-writer
  * per (corpus, artifact) — the standard ingest-pipeline shape. A
  * racing second builder is benign on the full-rebuild path (staged
  * versions are per-writer unique, the pointer swap last-writer-wins
  * over identical deterministic content), but two processes appending
  * the SAME increment concurrently could interleave files inside one
  * deterministic `_gen` partition — serialize ingest, as any table
  * format requires of its committers.
  */
object IncrementalDocArtifact {

  /** One ADDITIVE (or, with `pinned`, TRAINED) stored piece.
    *
    * @param build  (docs-subset, ctx) → piece rows. Additive pieces
    *               must be per-doc/additive; pinned pieces always
    *               receive the WHOLE corpus (they only build at full
    *               rebuild). `ctx.stored` may read pieces declared
    *               earlier.
    * @param fold   applied to base ∪ delta at compaction (e.g. re-sort
    *               by a filter column, or collapse additive partials);
    *               identity when None
    * @param pinned built at full rebuild only; increments write no
    *               delta — the fixed-trained-artifact contract
    */
  final case class Piece(name: String,
      build: (DataFrame, AdvanceCtx) => DataFrame,
      fold: Option[DataFrame => DataFrame] = None,
      pinned: Boolean = false)

  /** One KEYED-UPSERT stored piece — a global result maintained by
    * writing only the rows an increment changed; reads resolve
    * last-writer-wins per `keyCols` by generation sequence.
    *
    * @param buildFull whole-corpus build (first build + any non-append
    *                  corpus change)
    * @param advance   increment step: returns ONLY the new/changed
    *                  keyed rows (each key at most once), computed from
    *                  [[AdvanceCtx]]'s pre-increment views. MUST be
    *                  generation-chunking invariant (one advance over a
    *                  union of appends ≡ chained per-append advances) —
    *                  lazy catch-up relies on it.
    */
  final case class MergePiece(name: String,
      keyCols: Seq[String],
      buildFull: (DataFrame, AdvanceCtx) => DataFrame,
      advance: AdvanceCtx => DataFrame)

  /** What a builder may read: the documents it must process (`newDocs`
    * is the increment's new files, or the whole corpus at full
    * rebuild) and a view of the stored pieces — pre-increment during
    * an advance (the generations being written/caught-up are excluded,
    * so a crash replay reads identical inputs), rebuilt-so-far during
    * a rebuild.
    */
  final class AdvanceCtx private[IncrementalDocArtifact] (
      val spark: SparkSession,
      val newDocs: DataFrame,
      view: String => DataFrame) {
    def stored(name: String): DataFrame = view(name)
  }

  /** `compactEvery = 8` is the measured default (SURVEY §9.20: serve
    * amplification stays ≤ ~30% for a scan-bound query through 7 live
    * generations and within noise for screen queries; the fold at the
    * 8th returns latency below the fresh build). Raise it for
    * append-heavy/read-light artifacts, 0 disables auto-compaction.
    */
  final class Handle(corpusPath: String, key: String, pieces: Seq[Piece],
      merges: Seq[MergePiece], compactEvery: Int,
      lazyMerges: Boolean = false,
      onAdvanceDone: AdvanceCtx => Unit = _ => ()) {

    private val allNames: Seq[String] = pieces.map(_.name) ++ merges.map(_.name)
    require(allNames.nonEmpty, "artifact needs at least one piece")
    require(allNames.distinct == allNames, "piece names must be unique")
    require(!lazyMerges || merges.nonEmpty,
      "lazyMerges without merge pieces is meaningless")

    private def root: Path =
      Paths.get(ArtifactStore.root, ArtifactStore.pathKey(corpusPath) + "_" + key)
    private def statePath: Path = root.resolve("state")
    private def baseIO(piece: String): ParquetTableIO =
      new ParquetTableIO(root.resolve(piece).resolve("base").toString)
    private def deltaDir(piece: String): Path =
      root.resolve(piece).resolve("delta")

    // -----------------------------------------------------------------
    // State ledger (v2): corpus DATA-file entries + `#v2` marker +
    // `#gen:<id>` committed generations + `#base:<piece>:<version>`
    // base snapshot versions. Legacy (pre-footer) states have no
    // footer: committed gens are unknowable, so every live gen is
    // treated as committed and the base check is skipped — the first
    // write under the new code converts the ledger.
    // -----------------------------------------------------------------

    private final case class LedgerState(entries: Seq[String],
        gens: Set[String], baseVersions: Map[String, String], v2: Boolean)

    /** Ledger entries track DATA files only: writers rewrite `_SUCCESS`
      * / `.crc` markers on every append, which would make a pure file
      * append look like a rewrite. Readers ignore those files.
      */
    private def isDataEntry(e: String): Boolean = {
      val rel = e.substring(0, e.indexOf('|'))
      val name = rel.substring(rel.lastIndexOf('/') + 1)
      !(name.startsWith("_") || name.startsWith("."))
    }

    private def readLedger(): LedgerState =
      if (!Files.exists(statePath)) LedgerState(Nil, Set.empty, Map.empty, v2 = true)
      else {
        val lines = Files.readAllLines(statePath).toArray.toSeq.map(_.toString)
          .filter(_.nonEmpty)
        val (meta, entries) = lines.partition(_.startsWith("#"))
        val gens = meta.filter(_.startsWith("#gen:"))
          .map(_.stripPrefix("#gen:")).toSet
        val bases = meta.filter(_.startsWith("#base:")).map { l =>
          val body = l.stripPrefix("#base:")
          val i = body.indexOf(':')
          body.substring(0, i) -> body.substring(i + 1)
        }.toMap
        LedgerState(entries, gens, bases, v2 = meta.contains("#v2"))
      }

    /** Current base snapshot version marker per piece ("-" when the
      * piece has no published base).
      */
    private def baseMarkers(): Map[String, String] =
      allNames.map { n =>
        n -> baseIO(n).currentDir
          .map(d => Paths.get(d).getFileName.toString).getOrElse("-")
      }.toMap

    /** Atomic-rename ledger commit — THE commit point of every
      * mutation. Base versions are read from the live pointers at
      * write time.
      */
    private def writeLedger(entries: Seq[String], gens: Set[String]): Unit = {
      val footer = Seq("#v2") ++
        gens.toSeq.sorted.map("#gen:" + _) ++
        baseMarkers().toSeq.sortBy(_._1).map { case (p, v) => s"#base:$p:$v" }
      val tmp = statePath.resolveSibling("state.tmp")
      Files.writeString(tmp, (entries ++ footer).mkString("\n"))
      Files.move(tmp, statePath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

    // per-generation entry lists (root/_gens/<id>) — written before the
    // ledger commit; an orphan file from a crashed advance is harmless
    private def genEntriesPath(g: String): Path = root.resolve("_gens").resolve(g)

    private def writeGenEntries(g: String, entries: Seq[String]): Unit = {
      Files.createDirectories(root.resolve("_gens"))
      Files.writeString(genEntriesPath(g), entries.mkString("\n"))
    }

    private def genEntries(g: String): Option[Seq[String]] = {
      val p = genEntriesPath(g)
      if (!Files.exists(p)) None
      else Some(Files.readAllLines(p).toArray.toSeq.map(_.toString)
        .filter(_.nonEmpty))
    }

    // merge-piece coverage ledger (lazy mode): the corpus entries the
    // piece's stored result reflects. Missing file = "covered through
    // the state ledger" (eager/legacy artifacts).
    private def coveredPath(piece: String): Path =
      root.resolve(piece).resolve("covered")

    private def coveredEntries(piece: String): Option[Seq[String]] = {
      val p = coveredPath(piece)
      if (!Files.exists(p)) None
      else Some(Files.readAllLines(p).toArray.toSeq.map(_.toString)
        .filter(_.nonEmpty))
    }

    private def writeCovered(piece: String, entries: Seq[String]): Unit = {
      Files.createDirectories(root.resolve(piece))
      val tmp = coveredPath(piece).resolveSibling("covered.tmp")
      Files.writeString(tmp, entries.mkString("\n"))
      Files.move(tmp, coveredPath(piece), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

    private def genId(newEntries: Seq[String]): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      newEntries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
      md.digest().take(8).map(b => f"$b%02x").mkString
    }

    /** Gen names the CURRENT base snapshot already folded in — written
      * inside the base version dir, so the list commits atomically
      * with the base pointer flip. A gen listed here is dead even if
      * its directory still exists (its deletion is mere GC): a crash
      * between the compaction commit and the physical delete can
      * never double-count rows.
      */
    private def foldedGens(piece: String): Set[String] =
      baseIO(piece).currentDir
        .map(d => Paths.get(d).resolve("_folded_gens"))
        .filter(Files.exists(_)) match {
        case Some(m) =>
          Files.readAllLines(m).toArray.toSeq.map(_.toString)
            .filter(_.nonEmpty).toSet
        case None => Set.empty
      }

    private def gensOf(piece: String): Seq[String] = {
      val d = deltaDir(piece)
      if (!Files.exists(d)) Nil
      else {
        val folded = foldedGens(piece)
        val s = Files.list(d)
        try s.filter(_.getFileName.toString.startsWith("_gen="))
          .toArray.toSeq.map(_.asInstanceOf[Path].getFileName.toString)
          .filterNot(folded)
        finally s.close()
      }
    }

    private[sources] def deltaGens(): Seq[String] =
      allNames.flatMap(gensOf).distinct

    /** Drop live delta generations the ledger never committed — the
      * debris of an advance that crashed before its ledger rename. If
      * the corpus then reverted to the pre-append listing, reconcile
      * short-circuits, and without this sweep the orphan generation's
      * rows (for additive pieces extra rows; for merge pieces WRONG
      * last-writer-wins overwrites referencing docs no longer in the
      * corpus) would serve as live. v2 ledgers only — a legacy ledger
      * cannot name its committed gens.
      *
      * Dropping a merge piece's generation also rolls the piece's
      * `covered` ledger back by that generation's entry list —
      * otherwise coverage would claim entries whose rows just died and
      * the lazy catch-up would never re-advance them (every live delta
      * has its `_gens` entry list: it is written before the first delta
      * row and deleted only after fold/rebuild).
      */
    private def dropUncommittedGens(st: LedgerState): Unit =
      if (st.v2) allNames.foreach { n =>
        val isMerge = merges.exists(_.name == n)
        gensOf(n).map(_.stripPrefix("_gen="))
          .filterNot(st.gens)
          .foreach { g =>
            deleteTree(deltaDir(n).resolve("_gen=" + g))
            if (isMerge) (coveredEntries(n), genEntries(g)) match {
              case (Some(cov), Some(dead)) =>
                writeCovered(n, cov.filterNot(dead.toSet))
              case _ => ()
            }
          }
      }

    /** Live delta rows of `piece` (folded and excluded gens skipped at
      * the PATH level — absorbed directories are never even listed in
      * the scan).
      */
    private def liveDelta(spark: SparkSession, piece: String,
        exclude: Set[String]): Option[DataFrame] = {
      val gens = gensOf(piece).filterNot(g => exclude.contains(g.stripPrefix("_gen=")))
      if (gens.isEmpty) None
      else Some(spark.read
        .option("basePath", deltaDir(piece).toString)
        .parquet(gens.map(g => deltaDir(piece).resolve(g).toString): _*)
        .drop("_gen"))
    }

    /** Additive piece view: base ∪ deltas (minus `exclude`). */
    private def readPiece(spark: SparkSession, piece: String,
        exclude: Set[String]): DataFrame = {
      val base = baseIO(piece)
      val parts = Seq(
        if (base.exists) Some(base.read(spark)) else None,
        liveDelta(spark, piece, exclude)).flatten
      parts.reduceOption(_.unionByName(_)).getOrElse(
        throw new IllegalStateException(s"no $piece artifact for $corpusPath"))
    }

    /** Merge piece view: LWW per key over base (seq −1) ∪ deltas.
      * Steady state (no deltas — fresh build or post-compaction) is a
      * plain base scan: the LWW window and its shuffle only exist
      * while unfolded generations do.
      */
    private def readMergeResolved(spark: SparkSession, mp: MergePiece,
        exclude: Set[String]): DataFrame = {
      val base = baseIO(mp.name)
      liveDelta(spark, mp.name, exclude) match {
        case None =>
          if (!base.exists) throw new IllegalStateException(
            s"no ${mp.name} artifact for $corpusPath")
          base.read(spark)
        case Some(deltas) =>
          val all =
            if (base.exists)
              base.read(spark).withColumn("_seq", lit(-1L)).unionByName(deltas)
            else deltas
          val w = Window.partitionBy(mp.keyCols.map(col): _*)
            .orderBy(col("_seq").desc)
          all.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1).drop("_rn", "_seq")
      }
    }

    private def view(spark: SparkSession, exclude: Set[String])(
        name: String): DataFrame =
      merges.find(_.name == name) match {
        case Some(mp) => readMergeResolved(spark, mp, exclude)
        case None => readPiece(spark, name, exclude)
      }

    private def writeDelta(df: DataFrame, piece: String, gen: String): Unit =
      df.withColumn("_gen", lit(gen))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_gen")
        .parquet(deltaDir(piece).toString)

    private def reconcile(spark: SparkSession): Unit = synchronized {
      val current = ArtifactStore.entries(corpusPath).filter(isDataEntry)
      val st = readLedger()
      dropUncommittedGens(st)
      if (st.entries == current) {
        // base-version check: a rebuild that crashed before its ledger
        // rename (then the corpus reverted) left poisoned bases behind
        // a matching ledger — the recorded versions disagree, rebuild
        if (!st.v2 || st.baseVersions == baseMarkers()) return
      }
      Files.createDirectories(root)
      val currentSet = current.toSet
      val newEntries = current.filterNot(st.entries.toSet)
      val appendOnly = st.entries.nonEmpty && st.entries.forall(currentSet) &&
        newEntries.nonEmpty
      // committed gens carried into the next ledger write; a legacy
      // ledger commits every live gen (they were all committed by the
      // old code's contract)
      val carriedGens =
        if (st.v2) st.gens
        else deltaGens().map(_.stripPrefix("_gen=")).toSet

      if (st.entries == current) {
        // only the base-version check failed → heal by full rebuild
        rebuildAll(spark, current)
      } else if (appendOnly) {
        val corpusRoot = Paths.get(corpusPath)
        val newFiles = newEntries.map(e =>
          corpusRoot.resolve(e.split('|').head).toString)
        val newDocs = spark.read.parquet(newFiles: _*)
        val gen = genId(newEntries)
        // seq = covered-file count before this increment: strictly
        // increasing across appends, deterministic under replay
        val seq = st.entries.size.toLong
        val ctx = new AdvanceCtx(spark, newDocs, view(spark, Set(gen)))
        writeGenEntries(gen, newEntries)
        if (lazyMerges)
          // merge pieces stay behind; pin their coverage at the
          // pre-append ledger if this is their first lazy skip
          merges.foreach(mp => if (coveredEntries(mp.name).isEmpty)
            writeCovered(mp.name, st.entries))
        else
          merges.foreach(mp => writeDelta(
            mp.advance(ctx).withColumn("_seq", lit(seq)), mp.name, gen))
        pieces.filterNot(_.pinned)
          .foreach(p => writeDelta(p.build(newDocs, ctx), p.name, gen))
        onAdvanceDone(ctx)
        // ledger advance is the commit point — atomic rename, last
        writeLedger(current, carriedGens + gen)
        if (!lazyMerges)
          merges.foreach(mp => writeCovered(mp.name, current))
      } else {
        rebuildAll(spark, current)
      }
      if (compactEvery > 0 && deltaGens().size >= compactEvery) compact(spark)
    }

    private def rebuildAll(spark: SparkSession, current: Seq[String]): Unit = {
      // stale deltas go FIRST so rebuild-order reads (a later piece
      // reading an earlier one through ctx) see only rebuilt bases
      allNames.foreach(n => deleteTree(deltaDir(n)))
      deleteTree(root.resolve("_gens"))
      val docs = spark.read.parquet(corpusPath)
      val ctx = new AdvanceCtx(spark, docs, view(spark, Set.empty))
      pieces.foreach(p => baseIO(p.name).overwrite(p.build(docs, ctx)))
      merges.foreach(mp => baseIO(mp.name).overwrite(mp.buildFull(docs, ctx)))
      onAdvanceDone(ctx)
      // coverage BEFORE the ledger commit: a crash in between leaves a
      // ledger that still mismatches (entries or base versions), so
      // the next reconcile rebuilds again — never a silently-ahead
      // coverage behind a committed ledger
      merges.foreach(mp => writeCovered(mp.name, current))
      writeLedger(current, Set.empty)
    }

    /** Advance every lazy merge piece through the committed entries it
      * has not yet reflected, as ONE combined increment (sound by the
      * generation-chunking invariance of [[MergePiece.advance]]).
      * Pre-increment views exclude the committed generations the piece
      * has not covered plus the catch-up generation being written —
      * one uniform exclusion set: pending additive gens exist only in
      * additive pieces, the catch-up gen only in merge pieces.
      * Deterministic under replay (gen id and seq derive from the
      * pending entry list alone); commit order delta → ledger →
      * coverage makes every crash window either a droppable orphan or
      * an idempotent re-advance.
      */
    private def catchUpMerges(spark: SparkSession): Unit = synchronized {
      if (merges.isEmpty) return
      val st = readLedger()
      if (st.entries.isEmpty) return
      val entrySet = st.entries.toSet
      // group pieces by their pending entries (normally all equal)
      val groups = merges.groupBy { mp =>
        val covered = coveredEntries(mp.name).getOrElse(st.entries).toSet
        st.entries.filterNot(covered)
      }.filter(_._1.nonEmpty)
      if (groups.isEmpty) return
      var gens = st.gens
      groups.foreach { case (pending, mps) =>
        val gen = genId(pending)
        val pendingSet = pending.toSet
        val coveredSet = entrySet -- pendingSet
        // exclude: committed gens not fully covered by this group
        // (additive gens of the pending appends, and — in crash-skew
        // replays — an already-committed catch-up gen of a piece that
        // got ahead) + the gen being written
        val exclude = gens.filter(g => genEntries(g) match {
          case Some(es) => !es.forall(coveredSet)
          case None => false // legacy gen: predates lazy mode, covered
        }) + gen
        val corpusRoot = Paths.get(corpusPath)
        val newFiles = pending.map(e =>
          corpusRoot.resolve(e.split('|').head).toString)
        val newDocs = spark.read.parquet(newFiles: _*)
        val seq = coveredSet.size.toLong
        val ctx = new AdvanceCtx(spark, newDocs, view(spark, exclude))
        writeGenEntries(gen, pending)
        mps.foreach(mp => writeDelta(
          mp.advance(ctx).withColumn("_seq", lit(seq)), mp.name, gen))
        onAdvanceDone(ctx)
        gens = gens + gen
        writeLedger(st.entries, gens)
        mps.foreach(mp => writeCovered(mp.name, st.entries))
      }
      if (compactEvery > 0 && deltaGens().size >= compactEvery) compact(spark)
    }

    /** Fold every delta generation into the base snapshots. CRASH
      * ATOMIC: the list of folded gens is written INSIDE the staged
      * base version, so it publishes in the same atomic pointer flip
      * as the folded data — a crash at any point leaves either the old
      * state (pointer unflipped, deltas live) or the new state
      * (pointer flipped, absorbed gens dead by marker even if their
      * directories survive). Physical deletion of absorbed gens is
      * garbage collection, re-attempted at the start of every
      * compaction. Lazy merges catch up FIRST: folding an additive
      * generation a merge piece has not reflected would break the
      * gen-level exclusion its catch-up views need.
      */
    def compact(spark: SparkSession): Unit = synchronized {
      if (lazyMerges) catchUpMerges(spark)
      // GC: directories a previous compaction absorbed but failed to
      // delete (they are dead by marker; remove before the marker is
      // superseded, or they would resurface as live gens)
      allNames.foreach { n =>
        foldedGens(n).foreach(g => deleteTree(deltaDir(n).resolve(g)))
      }
      if (deltaGens().isEmpty) return
      def foldInto(io: ParquetTableIO, df: DataFrame, folded: Seq[String]): Unit = {
        val staged = io.stage()
        df.write.mode("overwrite").parquet(staged.vDir.toString)
        Files.writeString(staged.vDir.resolve("_folded_gens"),
          folded.mkString("\n"))
        io.commitStaged(staged)
      }
      pieces.foreach { p =>
        val gens = gensOf(p.name)
        val merged = readPiece(spark, p.name, Set.empty)
        foldInto(baseIO(p.name), p.fold.map(_(merged)).getOrElse(merged), gens)
      }
      merges.foreach { mp =>
        foldInto(baseIO(mp.name), readMergeResolved(spark, mp, Set.empty),
          gensOf(mp.name))
      }
      // tidy path; a crash here is covered by the marker + next GC
      allNames.foreach { n =>
        foldedGens(n).foreach(g => deleteTree(deltaDir(n).resolve(g)))
      }
      // base versions changed under the committed ledger — re-commit
      // the footer, pruning gens no longer live anywhere (their data
      // is folded; their directories are dead by marker and the next
      // sweep GCs them). A crash before this rename heals by full
      // rebuild on the next reconcile.
      val st = readLedger()
      if (st.entries.nonEmpty) {
        val live = deltaGens().map(_.stripPrefix("_gen=")).toSet
        writeLedger(st.entries, st.gens.intersect(live))
        st.gens.diff(live).foreach(g => Files.deleteIfExists(genEntriesPath(g)))
      }
    }

    /** Force a full rebuild under the current corpus (drops every
      * delta generation) — the offline refresh hook of pinned /
      * generation-pinned artifacts (codebooks, pinned-idf features).
      */
    def rebuild(spark: SparkSession): Unit = synchronized {
      val current = ArtifactStore.entries(corpusPath).filter(isDataEntry)
      rebuildAll(spark, current)
    }

    /** Reconcile, then serve `piece` (additive: base ∪ delta; merge:
      * the LWW-resolved view, caught up first in lazy mode).
      */
    def serve(spark: SparkSession, piece: String): DataFrame = {
      reconcile(spark)
      if (lazyMerges && merges.exists(_.name == piece)) catchUpMerges(spark)
      view(spark, Set.empty)(piece)
    }

    private def deleteTree(dir: Path): Unit =
      if (Files.exists(dir)) {
        val s = Files.walk(dir)
        try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
        finally s.close()
      }
  }

  def apply(corpusPath: String, key: String, pieces: Seq[Piece],
      compactEvery: Int = 8): Handle =
    new Handle(corpusPath, key, pieces, Nil, compactEvery)

  def apply(corpusPath: String, key: String, pieces: Seq[Piece],
      merges: Seq[MergePiece], compactEvery: Int): Handle =
    new Handle(corpusPath, key, pieces, merges, compactEvery)

  def apply(corpusPath: String, key: String, pieces: Seq[Piece],
      merges: Seq[MergePiece], compactEvery: Int, lazyMerges: Boolean,
      onAdvanceDone: AdvanceCtx => Unit): Handle =
    new Handle(corpusPath, key, pieces, merges, compactEvery, lazyMerges,
      onAdvanceDone)
}
