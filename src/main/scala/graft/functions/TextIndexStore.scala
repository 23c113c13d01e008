package graft.functions

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{ArtifactStore, ParquetTableIO}

/** Persisted text-search index over a corpus directory, maintained
  * INCREMENTALLY — the base+delta discipline `StreamingLshDedup`
  * proved for the band index, applied to the postings/positional/stats
  * artifacts (what Elasticsearch's per-document indexing amortizes for
  * the reference, pyCassElastic.py:316-354: ES never re-derives its
  * inverted index from scratch on ingest, and neither does this store).
  *
  * Layout, per corpus path (keyed WITHOUT a content fingerprint — the
  * store versions its own content through a state ledger):
  *
  *   root/<pathKey>_inc/state            sorted `file|size|mtime` lines
  *                                       of the corpus files the index
  *                                       currently covers
  *   root/<pathKey>_inc/<piece>/base     versioned-pointer snapshot
  *                                       (ParquetTableIO)
  *   root/<pathKey>_inc/<piece>/delta/_gen=<g>/   one immutable
  *                                       partition per corpus increment
  *
  * Every read first reconciles the ledger against the corpus listing:
  *   - unchanged → serve base ∪ delta (no work);
  *   - pure file append (the ingest shape: new parquet files landed
  *     next to the covered ones) → index ONLY the new files into a
  *     `_gen` delta partition per piece — increment cost O(new docs),
  *     never O(corpus) — then advance the ledger;
  *   - anything else (a file rewritten, shrunk, removed) → full
  *     rebuild into a fresh base snapshot; deltas cleared. In-place
  *     corpus regrowth therefore still can never serve stale postings,
  *     the guarantee the old fingerprint key provided.
  *
  * Replay safety: the generation id is a hash of the new files' ledger
  * entries, so a crash between the piece writes and the ledger advance
  * re-derives the SAME `_gen` and dynamic partition overwrite replaces
  * the half-written partition instead of appending a second copy (the
  * ledger is the commit point; it moves by atomic rename, last).
  *
  * Stats stay exact under increments by storing ADDITIVE partials
  * (n_docs, sum_dl) per generation and folding at read: token counts
  * are integers well under 2^53, so the folded avgdl is bit-equal to a
  * whole-corpus average and persisted-index query results keep
  * hash-matching the rebuild-inline oracles (t11-t19). Postings and
  * positional rows are per-doc, so an append-only corpus makes them
  * cleanly additive.
  *
  * Scale note: delta partitions are clustered by term
  * (`sortWithinPartitions`), the scalable analogue of term
  * partitioning — a query's term filter skips non-matching row groups
  * via parquet min/max stats without creating a directory per term.
  * Compaction (every `compactEvery` increments, or explicit) folds
  * deltas into the base through the normal pointer commit, re-sorting
  * the merged postings by term.
  *
  * `SPARK_GRAFT_INDEX_DIR` overrides the store root (defaults under
  * the build's target dir, so `clean` drops the cache with everything
  * else).
  */
object TextIndexStore {

  /** Fold deltas into base once an increment pushes the generation
    * count past this (kept small: each generation adds a file listing
    * and a scan branch to every query until folded).
    */
  val compactEvery = 8

  private def normCol = TextFunctions.normalize(col("text"))

  private def incRoot(corpusPath: String): Path =
    Paths.get(ArtifactStore.root, ArtifactStore.pathKey(corpusPath) + "_inc")

  private def statePath(corpusPath: String): Path =
    incRoot(corpusPath).resolve("state")

  private def baseIO(corpusPath: String, piece: String): ParquetTableIO =
    new ParquetTableIO(incRoot(corpusPath).resolve(piece).resolve("base").toString)

  private def deltaDir(corpusPath: String, piece: String): Path =
    incRoot(corpusPath).resolve(piece).resolve("delta")

  private val pieces = Seq("postings", "positional", "statsparts")

  /** Cluster postings by term so a query's pushed term filter skips
    * row groups; cheap at build time, paid once per increment.
    */
  private def byTerm(df: DataFrame): DataFrame =
    df.repartition(col("term")).sortWithinPartitions("term")

  private def buildPiece(piece: String, docs: DataFrame): DataFrame = piece match {
    case "postings"   => byTerm(TextSearch.postings(docs, "doc_id", normCol))
    case "positional" => byTerm(TextSearch.positionalPostings(docs, "doc_id", normCol))
    case "statsparts" => // additive partial: fold at read keeps avgdl exact
      TextSearch.postings(docs, "doc_id", normCol)
        .groupBy(col("doc_id")).agg(first("dl").as("dl"))
        .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
  }

  /** Ledger entries track DATA files only: Spark rewrites `_SUCCESS`
    * (and local-FS `.crc`) markers on every append, which would make a
    * pure file append look like a rewrite and trigger a full rebuild.
    * Readers ignore those files, so the index legitimately can too.
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

  private def writeDelta(df: DataFrame, piece: String, corpusPath: String,
      gen: String): Unit =
    df.withColumn("_gen", lit(gen))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_gen")
      .parquet(deltaDir(corpusPath, piece).toString)

  private def deltaGens(corpusPath: String): Seq[Path] = {
    val d = deltaDir(corpusPath, "postings")
    if (!Files.exists(d)) Nil
    else {
      val s = Files.list(d)
      try s.filter(_.getFileName.toString.startsWith("_gen="))
        .toArray.toSeq.map(_.asInstanceOf[Path])
      finally s.close()
    }
  }

  private def readPiece(spark: SparkSession, corpusPath: String,
      piece: String): DataFrame = {
    val base = baseIO(corpusPath, piece)
    val delta = deltaDir(corpusPath, piece)
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
      throw new IllegalStateException(s"no $piece index for $corpusPath"))
  }

  /** Reconcile the ledger with the corpus listing; build base, index an
    * increment, or rebuild, as the diff dictates. Synchronized: one
    * maintainer per process (cross-process, the ledger rename and
    * pointer commits keep readers consistent; concurrent maintainers
    * converge because generations and bases are deterministic).
    */
  private def reconcile(spark: SparkSession, corpusPath: String): Unit = synchronized {
    val current = ArtifactStore.entries(corpusPath).filter(isDataEntry)
    val st = statePath(corpusPath)
    val indexed: Seq[String] =
      if (Files.exists(st)) Files.readAllLines(st).toArray.toSeq.map(_.toString)
      else Nil
    if (indexed == current) return
    Files.createDirectories(incRoot(corpusPath))
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
      pieces.foreach(p => writeDelta(buildPiece(p, newDocs), p, corpusPath, gen))
    } else {
      // first build, or a non-append change: full rebuild
      val docs = spark.read.parquet(corpusPath)
      pieces.foreach(p => baseIO(corpusPath, p).overwrite(buildPiece(p, docs)))
      pieces.foreach(p => deleteTree(deltaDir(corpusPath, p)))
    }
    // ledger advance is the commit point — atomic rename, written last
    val tmp = st.resolveSibling("state.tmp")
    Files.writeString(tmp, current.mkString("\n"))
    Files.move(tmp, st, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    if (deltaGens(corpusPath).size >= compactEvery) compact(spark, corpusPath)
  }

  /** Fold every delta generation into the base snapshots (one pointer
    * commit per piece, computed FROM the old base while readers keep
    * resolving it), then delete the absorbed partitions. Stats
    * partials fold to a single row; the merged postings re-cluster by
    * term. Runs automatically on the `compactEvery` cadence, or
    * standalone as an offline hygiene pass.
    */
  def compact(spark: SparkSession, corpusPath: String): Unit = synchronized {
    if (deltaGens(corpusPath).isEmpty) return
    pieces.foreach { p =>
      val merged = readPiece(spark, corpusPath, p)
      val folded = p match {
        case "statsparts" =>
          merged.agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
        case _ => byTerm(merged)
      }
      baseIO(corpusPath, p).overwrite(folded)
    }
    pieces.foreach(p => deleteTree(deltaDir(corpusPath, p)))
  }

  private def serve(spark: SparkSession, sfDir: String, piece: String): DataFrame = {
    val corpusPath = s"$sfDir/documents.parquet"
    reconcile(spark, corpusPath)
    readPiece(spark, corpusPath, piece)
  }

  /** Stored (doc_id, term, tf, dl) postings of the `documents` table
    * at `sfDir`; built on first use, advanced incrementally when the
    * corpus grows.
    */
  def postings(spark: SparkSession, sfDir: String): DataFrame =
    serve(spark, sfDir, "postings")

  /** Stored positional postings (doc_id, term, positions). */
  def positional(spark: SparkSession, sfDir: String): DataFrame =
    serve(spark, sfDir, "positional")

  /** Stored one-row corpus constants (n_docs, avgdl), folded from the
    * per-generation additive partials — exact (integer sums under
    * 2^53), so identical to a whole-corpus aggregate.
    */
  def stats(spark: SparkSession, sfDir: String): DataFrame =
    serve(spark, sfDir, "statsparts")
      .agg(sum("n_docs").as("nd"), sum("sum_dl").as("sd"))
      .select(col("nd").cast("double").as("n_docs"),
        (col("sd").cast("double") / col("nd").cast("double")).as("avgdl"))

  private def deleteTree(dir: Path): Unit =
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
}
