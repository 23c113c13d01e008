package graft.multimodal

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stored media near-dup cluster labels: static build equals the
  * inline signature-contracted CC (the m9 oracle transfers); an
  * append reclusters only the affected subgraph yet MERGES stored
  * clusters a bridge item connects; fresh content takes the fast
  * path; the incremental labelling equals a from-scratch rebuild.
  */
class MediaClusterStoreSpec extends SparkSpec {
  import spark.implicits._

  private def rowsOf(texts: Seq[(Long, String)]) = texts.map { case (id, t) =>
    Media.MediaRow(id, "image", t.getBytes("UTF-8"), "x", 0, 0, 0, 0L)
  }

  /** Deterministic 16-bit pHash of each candidate text (the stub
    * codec chain — md5-derived, so fixed forever).
    */
  private def hashOf(texts: Seq[String]): Map[String, Long] = {
    val ds = rowsOf(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }).toDS()
    val ph = Media.perceptualHash(Media.extractFeatures(ds, 16).toDF())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.map { case (t, i) => t -> ph(i.toLong) }.toMap
  }

  test("append merges two stored clusters through a Hamming bridge; store == rebuild") {
    // search the deterministic hash space for a bridge triple:
    // ham(a,c) <= 1, ham(b,c) <= 1, ham(a,b) == 2 (not near-dups
    // themselves, so a and b cluster separately until c arrives)
    val cands = (0 until 4000).map(i => s"media payload $i")
    val h = hashOf(cands)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val byHash = cands.toArray
    val triple = (for {
      c <- byHash.iterator
      partners = byHash.filter(t => t != c && ham(h(t), h(c)) <= 1)
      if partners.length >= 2
      pair <- partners.combinations(2)
      if ham(h(pair(0)), h(pair(1))) == 2
    } yield (pair(0), pair(1), c)).take(1).toList
    assert(triple.nonEmpty, "no bridge triple in 4000 candidates - widen the search")
    val (a, b, c) = triple.head

    val sf = Files.createTempDirectory("graft-mclust").toString
    val corpus = s"$sf/documents.parquet"
    def write(mode: String, docs: (Long, String)*): Unit =
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode(mode).parquet(corpus)
    // two 2-member clusters (exact dups of a and of b) + two unrelated
    write("overwrite", 0L -> a, 1L -> a, 2L -> b, 3L -> b,
      4L -> "something else entirely", 5L -> "and another thing")
    def labels() = MediaClusterStore.clusters(spark, sf, "documents")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val l0 = labels()
    assert(l0(0L) === l0(1L))
    assert(l0(2L) === l0(3L))
    assert(l0(0L) !== l0(2L), s"a/b must start in separate clusters")

    // the bridge item MERGES both clusters; labels equal a rebuild
    write("append", 10L -> c)
    val l1 = labels()
    assert(Set(0L, 1L, 2L, 3L, 10L).map(l1).size === 1,
      s"bridge must merge both clusters: $l1")
    assert(l1(4L) === l0(4L))

    // fresh content takes the fast path and changes nothing old
    write("append", 11L -> "totally novel payload xyz")
    val l2 = labels()
    assert(l2(11L) === 11L)
    assert(l2.filter(_._1 != 11L) === l1)

    // incremental labelling == from-scratch rebuild over the same docs
    val sf2 = Files.createTempDirectory("graft-mclust-rb").toString
    spark.read.parquet(corpus).coalesce(1)
      .write.parquet(s"$sf2/documents.parquet")
    val fresh = MediaClusterStore.clusters(spark, sf2, "documents")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l2 === fresh)
  }
}
