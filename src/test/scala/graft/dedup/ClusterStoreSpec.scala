package graft.dedup

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.TextFunctions
import graft.sources.ArtifactStore

/** Persisted duplicate clusters: stored ≡ inline, and the incremental
  * advance (the engine's first keyed-upsert piece) equals a full
  * rebuild across generation chunkings — including the hard case, a
  * new document MERGING two existing clusters.
  *
  * Merge fixture: single-token texts make the 32-bit simhash exactly
  * the token's md5 bits, so distances are constructed, not hoped for:
  * sig(w000004)–sig(w024470) Hamming 5, sig(w000531)–sig(w024470)
  * Hamming 4, sig(w000004)–sig(w000531) Hamming 7 — all in the same
  * top-16 block. At maxDist=6 the first two texts never pair directly
  * but both pair with the third.
  */
class ClusterStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stored clusters are identical to an inline contraction run") {
    val stored = ClusterStore.clusters(spark, dir, "documents", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d = Tables.load(spark, dir, "documents")
    val sims = SimHash.compute(d, "doc_id", TextFunctions.normalize(col("text")))
    val pairs = SimHash.nearPairs(sims, "doc_id", maxDist = 6)
    val inline = DupClusters.componentsAlternating(d, "doc_id", pairs,
        "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    stored shouldBe inline
    // second read serves the committed artifact
    ClusterStore.clusters(spark, dir, "documents", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe inline
  }

  private def writeDocs(corpus: String, mode: String, docs: (Long, String)*): Unit =
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode(mode).parquet(corpus)

  private def served(sf: String): Map[Long, Long] =
    ClusterStore.clusters(spark, sf, "documents", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  private def fullRebuildInline(corpus: String): Map[Long, Long] = {
    val d = spark.read.parquet(corpus)
    val sims = SimHash.compute(d, "doc_id", TextFunctions.normalize(col("text")))
    DupClusters.componentsContracted(d, "doc_id", sims, "simhash",
        reps => SimHash.nearPairs(reps, "doc_id", maxDist = 6))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  private def labelBaseFiles(corpus: String): Map[String, (Long, Long)] = {
    val base = Paths.get(ArtifactStore.root,
      ArtifactStore.pathKey(corpus) + "_clusters2_h6", "labels", "base")
    val s = Files.walk(base)
    try s.filter(f => Files.isRegularFile(f)).toArray.toSeq
      .map(_.asInstanceOf[Path])
      .map(f => f.toString ->
        ((Files.size(f), Files.getLastModifiedTime(f).toMillis)))
      .toMap
    finally s.close()
  }

  test("a corpus append relabels only the affected subgraph; a new doc merges two old clusters") {
    val sf = Files.createTempDirectory("graft-clinc").toString
    val corpus = s"$sf/documents.parquet"
    // gen 1: cluster {1,2} (exact dups), singleton {3}, far singleton {4}
    writeDocs(corpus, "overwrite",
      1L -> "w000004", 2L -> "w000004", 3L -> "w000531", 4L -> "w031495")
    served(sf) shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L)
    val before = labelBaseFiles(corpus)

    // gen 2: doc 5 bridges {1,2} and {3}; doc 6 is an exact dup of 1
    writeDocs(corpus, "append", 5L -> "w024470", 6L -> "w000004")
    val after = served(sf)
    after shouldBe Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 1L, 6L -> 1L)
    after shouldBe fullRebuildInline(corpus)
    // the increment upserted through a delta: base files byte-untouched
    labelBaseFiles(corpus) shouldBe before

    // gen 3: exact dup of the so-far-untouched cluster {4}
    writeDocs(corpus, "append", 8L -> "w031495")
    val third = served(sf)
    third shouldBe fullRebuildInline(corpus)
    third(8L) shouldBe 4L
    third(1L) shouldBe 1L // unaffected labels survive via the LWW read
    labelBaseFiles(corpus) shouldBe before

    // gen 4: FRESH content only (no near-pair edge to anything) — the
    // fast path: each doc labels to its signature group's rep, two
    // docs sharing a fresh signature cluster together
    writeDocs(corpus, "append",
      10L -> "w014713", 11L -> "w014713", 12L -> "w051216")
    val fourth = served(sf)
    fourth shouldBe fullRebuildInline(corpus)
    fourth(10L) shouldBe 10L
    fourth(11L) shouldBe 10L
    fourth(12L) shouldBe 12L
    labelBaseFiles(corpus) shouldBe before

    // compaction folds the resolved view into the base, same answer
    ClusterStore.compact(spark, corpus, maxDist = 6)
    served(sf) shouldBe fourth

    // a NON-append change (rewrite in place) keys a full rebuild
    writeDocs(corpus, "overwrite",
      1L -> "w000004", 9L -> "w000531")
    served(sf) shouldBe fullRebuildInline(corpus)
    served(sf).keySet shouldBe Set(1L, 9L) // nothing stale survives
  }
}
