package graft.functions

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ArtifactStore

/** Incremental maintenance of the persisted text index: a corpus file
  * append advances the index through a delta generation that leaves
  * the base snapshot's files byte-untouched; a non-append change
  * triggers a full rebuild; results always equal an inline build over
  * the whole corpus (so the t11-t19 oracles hold over an
  * incrementally-maintained index).
  */
class TextIndexIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def newCorpus(tag: String): (String, String) = {
    val sf = Files.createTempDirectory(s"graft-inc-$tag").toString
    (sf, s"$sf/documents.parquet")
  }

  private def writeDocs(corpus: String, mode: String, docs: (Long, String)*): Unit =
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode(mode).parquet(corpus)

  private def norm = TextFunctions.normalize(col("text"))

  private def inlinePostings(corpus: String) =
    TextSearch.postings(spark.read.parquet(corpus), "doc_id", norm)
      .collect().map(_.toSeq).toSet

  private def baseFiles(corpus: String): Map[String, (Long, Long)] = {
    val base = Paths.get(ArtifactStore.root,
      ArtifactStore.pathKey(corpus) + "_inc3", "postings", "base")
    val s = Files.walk(base)
    try s.filter(f => Files.isRegularFile(f)).toArray.toSeq
      .map(_.asInstanceOf[Path])
      .map(f => f.toString ->
        ((Files.size(f), Files.getLastModifiedTime(f).toMillis)))
      .toMap
    finally s.close()
  }

  private def deltaGenDirs(corpus: String): Seq[String] = {
    val d = Paths.get(ArtifactStore.root,
      ArtifactStore.pathKey(corpus) + "_inc3", "postings", "delta")
    if (!Files.exists(d)) Nil
    else {
      val s = Files.list(d)
      try s.toArray.toSeq.map(_.toString)
        .filter(_.contains("_gen=")).sorted
      finally s.close()
    }
  }

  test("corpus append advances via a delta; base files byte-untouched") {
    val (sf, corpus) = newCorpus("append")
    writeDocs(corpus, "overwrite",
      1L -> "spark engine fast", 2L -> "slow engine")
    TextIndexStore.postings(spark, sf).collect().map(_.toSeq).toSet shouldBe
      inlinePostings(corpus)
    val before = baseFiles(corpus)
    deltaGenDirs(corpus) shouldBe empty

    writeDocs(corpus, "append", 3L -> "spark rare engine", 4L -> "rare")
    val got = TextIndexStore.postings(spark, sf).collect().map(_.toSeq).toSet
    got shouldBe inlinePostings(corpus)
    baseFiles(corpus) shouldBe before  // increment never rewrote the base
    deltaGenDirs(corpus) should have size 1

    // stats fold the additive partials exactly: 4 docs, 9 tokens
    val st = TextIndexStore.stats(spark, sf).collect().head
    st.getDouble(0) shouldBe 4.0
    st.getDouble(1) shouldBe 9.0 / 4.0

    // a second append stacks a second generation, base still untouched
    writeDocs(corpus, "append", 5L -> "engine spark engine")
    TextIndexStore.postings(spark, sf).collect().map(_.toSeq).toSet shouldBe
      inlinePostings(corpus)
    baseFiles(corpus) shouldBe before
    deltaGenDirs(corpus) should have size 2
  }

  test("phrase queries hold over an incrementally-updated positional index") {
    val (sf, corpus) = newCorpus("phrase")
    writeDocs(corpus, "overwrite", 1L -> "big data engine", 2L -> "data big")
    TextIndexStore.positional(spark, sf).count() should be > 0L
    writeDocs(corpus, "append", 3L -> "the big data engine wins")
    val hits = TextSearch.phraseMatch(
        TextIndexStore.positional(spark, sf), "doc_id",
        Seq("big", "data", "engine"))
      .select("doc_id").as[Long].collect().toSet
    hits shouldBe Set(1L, 3L)
  }

  test("compaction folds deltas into the base; results unchanged") {
    val (sf, corpus) = newCorpus("compact")
    writeDocs(corpus, "overwrite", 1L -> "alpha beta", 2L -> "beta gamma")
    TextIndexStore.postings(spark, sf)
    writeDocs(corpus, "append", 3L -> "gamma alpha alpha")
    TextIndexStore.postings(spark, sf)
    deltaGenDirs(corpus) should have size 1

    TextIndexStore.compact(spark, corpus)
    // r11: the absorbed gen dir survives the fold that absorbed it as
    // the in-flight-reader grace window (dead by marker — results are
    // already folded-exact); the NEXT compaction's sweep deletes it
    TextIndexStore.compact(spark, corpus)
    deltaGenDirs(corpus) shouldBe empty
    TextIndexStore.postings(spark, sf).collect().map(_.toSeq).toSet shouldBe
      inlinePostings(corpus)
    val st = TextIndexStore.stats(spark, sf).collect().head
    st.getDouble(0) shouldBe 3.0
    st.getDouble(1) shouldBe 7.0 / 3.0
  }

  test("non-append corpus change triggers a full rebuild, never stale reads") {
    val (sf, corpus) = newCorpus("rewrite")
    writeDocs(corpus, "overwrite", 1L -> "old text here")
    TextIndexStore.postings(spark, sf)
    writeDocs(corpus, "append", 2L -> "more old text")
    TextIndexStore.postings(spark, sf)
    deltaGenDirs(corpus) should have size 1

    // rewrite in place: different docs, same path
    writeDocs(corpus, "overwrite", 10L -> "completely new corpus")
    val got = TextIndexStore.postings(spark, sf).collect().map(_.toSeq).toSet
    got shouldBe inlinePostings(corpus)
    got.map(_.head) shouldBe Set(10L)   // nothing stale survived
    deltaGenDirs(corpus) shouldBe empty // rebuild cleared the deltas
  }
}
