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
  * before them; at an increment, every view excludes the generation
  * being written (crash replay reads identical inputs). That is how a
  * codes piece encodes with the pinned books, and how cluster labels
  * probe the stored signature table.
  *
  * Layout, per (corpus path, artifact key):
  *
  *   root/<pathKey>_<key>/state          sorted `file|size|mtime` lines
  *                                       of covered corpus DATA files
  *   root/<pathKey>_<key>/<piece>/base   versioned-pointer snapshot
  *   root/<pathKey>_<key>/<piece>/delta/_gen=<g>/  one immutable
  *                                       partition per corpus increment
  *                                       (merge pieces also carry a
  *                                       monotone `_seq` column; base
  *                                       rows rank as seq −1)
  *
  * Reconciliation per read: ledger == listing → serve; pure file
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
    *                  [[AdvanceCtx]]'s pre-increment views
    */
  final case class MergePiece(name: String,
      keyCols: Seq[String],
      buildFull: (DataFrame, AdvanceCtx) => DataFrame,
      advance: AdvanceCtx => DataFrame)

  /** What a builder may read: the documents it must process (`newDocs`
    * is the increment's new files, or the whole corpus at full
    * rebuild) and a view of the stored pieces — pre-increment during
    * an advance (the generation being written is excluded, so a crash
    * replay reads identical inputs), rebuilt-so-far during a rebuild.
    */
  final class AdvanceCtx private[IncrementalDocArtifact] (
      val spark: SparkSession,
      val newDocs: DataFrame,
      view: String => DataFrame) {
    def stored(name: String): DataFrame = view(name)
  }

  final class Handle(corpusPath: String, key: String, pieces: Seq[Piece],
      merges: Seq[MergePiece], compactEvery: Int) {

    private val allNames: Seq[String] = pieces.map(_.name) ++ merges.map(_.name)
    require(allNames.nonEmpty, "artifact needs at least one piece")
    require(allNames.distinct == allNames, "piece names must be unique")

    private def root: Path =
      Paths.get(ArtifactStore.root, ArtifactStore.pathKey(corpusPath) + "_" + key)
    private def statePath: Path = root.resolve("state")
    private def baseIO(piece: String): ParquetTableIO =
      new ParquetTableIO(root.resolve(piece).resolve("base").toString)
    private def deltaDir(piece: String): Path =
      root.resolve(piece).resolve("delta")

    /** Ledger entries track DATA files only: writers rewrite `_SUCCESS`
      * / `.crc` markers on every append, which would make a pure file
      * append look like a rewrite. Readers ignore those files.
      */
    private def isDataEntry(e: String): Boolean = {
      val rel = e.substring(0, e.indexOf('|'))
      val name = rel.substring(rel.lastIndexOf('/') + 1)
      !(name.startsWith("_") || name.startsWith("."))
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

    /** Live delta rows of `piece` (folded and excluded gens skipped at
      * the PATH level — absorbed directories are never even listed in
      * the scan).
      */
    private def liveDelta(spark: SparkSession, piece: String,
        excludeGen: Option[String]): Option[DataFrame] = {
      val gens = gensOf(piece).filterNot(excludeGen.map("_gen=" + _).contains)
      if (gens.isEmpty) None
      else Some(spark.read
        .option("basePath", deltaDir(piece).toString)
        .parquet(gens.map(g => deltaDir(piece).resolve(g).toString): _*)
        .drop("_gen"))
    }

    /** Additive piece view: base ∪ deltas (minus `excludeGen`). */
    private def readPiece(spark: SparkSession, piece: String,
        excludeGen: Option[String]): DataFrame = {
      val base = baseIO(piece)
      val parts = Seq(
        if (base.exists) Some(base.read(spark)) else None,
        liveDelta(spark, piece, excludeGen)).flatten
      parts.reduceOption(_.unionByName(_)).getOrElse(
        throw new IllegalStateException(s"no $piece artifact for $corpusPath"))
    }

    /** Merge piece view: LWW per key over base (seq −1) ∪ deltas.
      * Steady state (no deltas — fresh build or post-compaction) is a
      * plain base scan: the LWW window and its shuffle only exist
      * while unfolded generations do.
      */
    private def readMergeResolved(spark: SparkSession, mp: MergePiece,
        excludeGen: Option[String]): DataFrame = {
      val base = baseIO(mp.name)
      liveDelta(spark, mp.name, excludeGen) match {
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

    private def view(spark: SparkSession, excludeGen: Option[String])(
        name: String): DataFrame =
      merges.find(_.name == name) match {
        case Some(mp) => readMergeResolved(spark, mp, excludeGen)
        case None => readPiece(spark, name, excludeGen)
      }

    private def writeDelta(df: DataFrame, piece: String, gen: String): Unit =
      df.withColumn("_gen", lit(gen))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_gen")
        .parquet(deltaDir(piece).toString)

    private def reconcile(spark: SparkSession): Unit = synchronized {
      val current = ArtifactStore.entries(corpusPath).filter(isDataEntry)
      val indexed: Seq[String] =
        if (Files.exists(statePath))
          Files.readAllLines(statePath).toArray.toSeq.map(_.toString)
        else Nil
      if (indexed == current) return
      Files.createDirectories(root)
      val currentSet = current.toSet
      val newEntries = current.filterNot(indexed.toSet)
      val appendOnly = indexed.nonEmpty && indexed.forall(currentSet) &&
        newEntries.nonEmpty

      if (appendOnly) {
        val corpusRoot = Paths.get(corpusPath)
        val newFiles = newEntries.map(e =>
          corpusRoot.resolve(e.split('|').head).toString)
        val newDocs = spark.read.parquet(newFiles: _*)
        val gen = genId(newEntries)
        // seq = covered-file count before this increment: strictly
        // increasing across appends, deterministic under replay
        val seq = indexed.size.toLong
        val ctx = new AdvanceCtx(spark, newDocs, view(spark, Some(gen)))
        merges.foreach(mp => writeDelta(
          mp.advance(ctx).withColumn("_seq", lit(seq)), mp.name, gen))
        pieces.filterNot(_.pinned)
          .foreach(p => writeDelta(p.build(newDocs, ctx), p.name, gen))
      } else {
        // stale deltas go FIRST so rebuild-order reads (a later piece
        // reading an earlier one through ctx) see only rebuilt bases
        allNames.foreach(n => deleteTree(deltaDir(n)))
        val docs = spark.read.parquet(corpusPath)
        val ctx = new AdvanceCtx(spark, docs, view(spark, None))
        pieces.foreach(p => baseIO(p.name).overwrite(p.build(docs, ctx)))
        merges.foreach(mp => baseIO(mp.name).overwrite(mp.buildFull(docs, ctx)))
      }
      // ledger advance is the commit point — atomic rename, written last
      val tmp = statePath.resolveSibling("state.tmp")
      Files.writeString(tmp, current.mkString("\n"))
      Files.move(tmp, statePath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
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
      * compaction.
      */
    def compact(spark: SparkSession): Unit = synchronized {
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
        val merged = readPiece(spark, p.name, None)
        foldInto(baseIO(p.name), p.fold.map(_(merged)).getOrElse(merged), gens)
      }
      merges.foreach { mp =>
        foldInto(baseIO(mp.name), readMergeResolved(spark, mp, None),
          gensOf(mp.name))
      }
      // tidy path; a crash here is covered by the marker + next GC
      allNames.foreach { n =>
        foldedGens(n).foreach(g => deleteTree(deltaDir(n).resolve(g)))
      }
    }

    /** Reconcile, then serve `piece` (additive: base ∪ delta; merge:
      * the LWW-resolved view).
      */
    def serve(spark: SparkSession, piece: String): DataFrame = {
      reconcile(spark)
      view(spark, None)(piece)
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
}
