package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Generic incremental maintenance for derived-per-document artifacts —
  * the base+delta ledger discipline `TextIndexStore` proved, extracted
  * so ANY artifact whose rows derive per-document (postings, quality
  * scores, fingerprints, codes) gets O(new)-cost increments instead of
  * full rebuilds. The engine owns the layout, staleness reconciliation,
  * replay safety and compaction; callers supply the per-piece builders.
  *
  * Layout, per (corpus path, artifact key):
  *
  *   root/<pathKey>_<key>/state          sorted `file|size|mtime` lines
  *                                       of covered corpus DATA files
  *   root/<pathKey>_<key>/<piece>/base   versioned-pointer snapshot
  *   root/<pathKey>_<key>/<piece>/delta/_gen=<g>/  one immutable
  *                                       partition per corpus increment
  *
  * Reconciliation per read: ledger == listing → serve; pure file
  * append → build each piece over ONLY the new files into a
  * deterministic `_gen` partition (replay overwrites itself), advance
  * the ledger by atomic rename LAST; anything else → full rebuild,
  * deltas cleared — an in-place regrown corpus can never serve stale
  * rows. Additivity contract: a piece built over a corpus subset
  * unioned across subsets must equal the piece built over the whole —
  * true for any per-document map (and for additive partials folded at
  * read, the stats trick). Compaction folds deltas into the base via
  * the pointer commit on the `compactEvery` cadence or on demand.
  */
object IncrementalDocArtifact {

  /** One stored piece of the artifact.
    *
    * @param build  docs-subset → piece rows (must be per-doc/additive)
    * @param fold   applied to base ∪ delta at compaction (e.g. re-sort
    *               by a filter column, or collapse additive partials);
    *               identity when None
    */
  final case class Piece(name: String,
      build: DataFrame => DataFrame,
      fold: Option[DataFrame => DataFrame] = None)

  final class Handle(corpusPath: String, key: String, pieces: Seq[Piece],
      compactEvery: Int) {

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

    private[sources] def deltaGens(): Seq[Path] = {
      val d = deltaDir(pieces.head.name)
      if (!Files.exists(d)) Nil
      else {
        val s = Files.list(d)
        try s.filter(_.getFileName.toString.startsWith("_gen="))
          .toArray.toSeq.map(_.asInstanceOf[Path])
        finally s.close()
      }
    }

    private def readPiece(spark: SparkSession, piece: String): DataFrame = {
      val base = baseIO(piece)
      val delta = deltaDir(piece)
      val hasDelta = Files.exists(delta) && {
        val s = Files.list(delta)
        try s.anyMatch(_.getFileName.toString.startsWith("_gen="))
        finally s.close()
      }
      val parts = Seq(
        if (base.exists) Some(base.read(spark)) else None,
        if (hasDelta) Some(spark.read.parquet(delta.toString).drop("_gen"))
        else None).flatten
      parts.reduceOption(_.unionByName(_)).getOrElse(
        throw new IllegalStateException(s"no $piece artifact for $corpusPath"))
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
        pieces.foreach(p => writeDelta(p.build(newDocs), p.name, gen))
      } else {
        val docs = spark.read.parquet(corpusPath)
        pieces.foreach(p => baseIO(p.name).overwrite(p.build(docs)))
        pieces.foreach(p => deleteTree(deltaDir(p.name)))
      }
      // ledger advance is the commit point — atomic rename, written last
      val tmp = statePath.resolveSibling("state.tmp")
      Files.writeString(tmp, current.mkString("\n"))
      Files.move(tmp, statePath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      if (compactEvery > 0 && deltaGens().size >= compactEvery) compact(spark)
    }

    /** Fold every delta generation into the base snapshots (pointer
      * commit per piece), then delete the absorbed partitions.
      */
    def compact(spark: SparkSession): Unit = synchronized {
      if (deltaGens().isEmpty) return
      pieces.foreach { p =>
        val merged = readPiece(spark, p.name)
        baseIO(p.name).overwrite(p.fold.map(_(merged)).getOrElse(merged))
      }
      pieces.foreach(p => deleteTree(deltaDir(p.name)))
    }

    /** Reconcile, then serve base ∪ delta of `piece`. */
    def serve(spark: SparkSession, piece: String): DataFrame = {
      reconcile(spark)
      readPiece(spark, piece)
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
    new Handle(corpusPath, key, pieces, compactEvery)
}
