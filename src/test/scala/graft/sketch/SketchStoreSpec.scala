package graft.sketch

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.sources.ArtifactStore

/** The persisted sketch artifact: a fold over stored per-generation
  * partials equals the single-build sketch BIT-FOR-BIT (CMS counters
  * sum, HLL registers max, histogram bins sum, card moments sum — all
  * exactly associative), however the corpus was chunked into
  * generations; an append advances O(new) (base files byte-untouched);
  * and serving runs zero corpus scans.
  */
class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private def newCorpus(tag: String): (String, String) = {
    val sf = Files.createTempDirectory(s"graft-sketch-$tag").toString
    (sf, s"$sf/documents.parquet")
  }

  private def writeDocs(corpus: String, mode: String,
      docs: (Long, String, String, String)*): Unit =
    docs.toDF("doc_id", "text", "lang", "source").coalesce(1)
      .write.mode(mode).parquet(corpus)

  private def docsDf(corpus: String): DataFrame = spark.read.parquet(corpus)

  private def toks(corpus: String): DataFrame =
    docsDf(corpus).select(col("source"), explode(
      TextFunctions.tokens(TextFunctions.normalize(col("text")))).as("term"))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def baseFiles(corpus: String, piece: String): Map[String, (Long, Long)] = {
    val base = Paths.get(ArtifactStore.root,
      ArtifactStore.pathKey(corpus) + "_sk1", piece, "base")
    val s = Files.walk(base)
    try s.filter(f => Files.isRegularFile(f)).toArray.toSeq
      .map(_.asInstanceOf[Path])
      .map(f => f.toString ->
        ((Files.size(f), Files.getLastModifiedTime(f).toMillis)))
      .toMap
    finally s.close()
  }

  private def assertStoredEqualsInline(sf: String, corpus: String): Unit = {
    assert(rows(SketchStore.cms(spark, sf, "documents")) ===
      rows(CountMin.build(toks(corpus), col("term"),
        SketchStore.Depth, SketchStore.Width)))
    assert(rows(SketchStore.hll(spark, sf, "documents")) ===
      rows(HyperLogLog.build(toks(corpus), col("term"),
        keys = Seq("source"))))
    assert(rows(SketchStore.tokenHist(spark, sf, "documents")) ===
      rows(LogHistogram.build(
        docsDf(corpus).select(TextFunctions.tokenCount(
          TextFunctions.normalize(col("text"))).cast("double").as("tok")),
        col("tok"))))
    assert(rows(SketchStore.card(spark, sf, "documents")) ===
      rows(docsDf(corpus)
        .select(col("lang"), col("source"),
          TextFunctions.tokenCount(TextFunctions.normalize(col("text")))
            .cast("long").as("tok"),
          octet_length(col("text")).cast("long").as("bts"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"),
          sum("bts").as("n_bytes"))))
  }

  private val docsA = Seq[(Long, String, String, String)](
    (1L, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (2L, "a quick brown dog outpaces a lazy fox", "en", "web"),
    (3L, "entirely unrelated text about spark query planning", "en", "books"),
    (4L, "spark query planning with catalyst and tungsten", "en", "books"),
    (5L, "le renard brun rapide saute par dessus le chien", "fr", "web"))

  private val docsB = Seq[(Long, String, String, String)](
    (6L, "quick spark fox planning never sleeps", "en", "news"),
    (7L, "a brand new document with tokens unseen anywhere before", "en", "web"))

  test("fresh build: stored folds equal single-build sketches; serve scans no corpus") {
    val (sf, corpus) = newCorpus("fresh")
    writeDocs(corpus, "overwrite", docsA: _*)
    assertStoredEqualsInline(sf, corpus)
    // zero corpus scans in any serve plan
    Seq(SketchStore.cms(spark, sf, "documents"),
        SketchStore.hll(spark, sf, "documents"),
        SketchStore.tokenHist(spark, sf, "documents"),
        SketchStore.card(spark, sf, "documents")).foreach { df =>
      val scans = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten
      assert(scans.nonEmpty)
      scans.foreach(p => assert(p.contains(ArtifactStore.root),
        s"serve plan scans outside the store: $p"))
    }
  }

  test("append advances O(new); folded serve equals fresh single build") {
    val (sf, corpus) = newCorpus("append")
    writeDocs(corpus, "overwrite", docsA: _*)
    SketchStore.card(spark, sf, "documents").collect() // materialize base
    val before = Seq("cms", "hll", "hist", "card")
      .map(p => p -> baseFiles(corpus, p)).toMap
    writeDocs(corpus, "append", docsB: _*)
    assertStoredEqualsInline(sf, corpus)
    // the increment wrote only delta generations — every base file
    // of every piece is byte-untouched
    Seq("cms", "hll", "hist", "card").foreach { p =>
      assert(baseFiles(corpus, p) === before(p), s"piece $p base changed")
    }
  }

  test("generation-chunking invariance: 3-chunk ingest equals one-shot ingest") {
    val (sf1, corpus1) = newCorpus("chunk1")
    val (sf3, corpus3) = newCorpus("chunk3")
    val all = docsA ++ docsB
    writeDocs(corpus1, "overwrite", all: _*)
    writeDocs(corpus3, "overwrite", all.take(2): _*)
    SketchStore.card(spark, sf3, "documents").collect()
    writeDocs(corpus3, "append", all.slice(2, 5): _*)
    SketchStore.card(spark, sf3, "documents").collect()
    writeDocs(corpus3, "append", all.drop(5): _*)
    assert(rows(SketchStore.cms(spark, sf3, "documents")) ===
      rows(SketchStore.cms(spark, sf1, "documents")))
    assert(rows(SketchStore.hll(spark, sf3, "documents")) ===
      rows(SketchStore.hll(spark, sf1, "documents")))
    assert(rows(SketchStore.tokenHist(spark, sf3, "documents")) ===
      rows(SketchStore.tokenHist(spark, sf1, "documents")))
    assert(rows(SketchStore.card(spark, sf3, "documents")) ===
      rows(SketchStore.card(spark, sf1, "documents")))
  }

  test("compaction folds partials to the single-sketch bound; serve unchanged") {
    val (sf, corpus) = newCorpus("compact")
    writeDocs(corpus, "overwrite", docsA: _*)
    SketchStore.card(spark, sf, "documents").collect()
    writeDocs(corpus, "append", docsB: _*)
    val pre = Seq(
      rows(SketchStore.cms(spark, sf, "documents")),
      rows(SketchStore.hll(spark, sf, "documents")),
      rows(SketchStore.tokenHist(spark, sf, "documents")),
      rows(SketchStore.card(spark, sf, "documents")))
    SketchStore.compact(spark, corpus)
    assert(rows(SketchStore.cms(spark, sf, "documents")) === pre(0))
    assert(rows(SketchStore.hll(spark, sf, "documents")) === pre(1))
    assert(rows(SketchStore.tokenHist(spark, sf, "documents")) === pre(2))
    assert(rows(SketchStore.card(spark, sf, "documents")) === pre(3))
    // after the fold the hll base holds at most one row per
    // (source, register) — the single-sketch row bound
    val hllBase = new graft.sources.ParquetTableIO(
      Paths.get(ArtifactStore.root,
        ArtifactStore.pathKey(corpus) + "_sk1", "hll", "base").toString)
      .read(spark)
    assert(hllBase.groupBy("source", "register").count()
      .agg(max("count")).head.getLong(0) === 1L)
  }

  test("adaptive width is memoized per corpus version: steady-state serve runs zero driver actions") {
    val (sf, corpus) = newCorpus("adwidth")
    writeDocs(corpus, "overwrite", docsA: _*)
    val (sk1, w1) = SketchStore.cmsAdaptive(spark, sf, "documents")
    sk1.collect() // build artifacts, populate the width memo

    // count only THIS thread's jobs (job-group is thread-local, so
    // concurrently-running suites on the shared session can't pollute)
    val group = "graft-adwidth-memo"
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.properties != null &&
            group == js.properties.getProperty("spark.jobGroup.id")) {
          jobs.incrementAndGet()
          descs.add(String.valueOf(
            js.properties.getProperty("spark.job.description")) + " / " +
            js.stageInfos.map(_.name).mkString(";"))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(group, "adaptive-width memo check")
    try {
      val (_, w2) = SketchStore.cmsAdaptive(spark, sf, "documents")
      w2 shouldBe w1 // same corpus → memo hit, no vocabulary count job
      Thread.sleep(1000) // listener bus is async — let events land
      // the memo removes the pre-serve ACTION (the vocabulary count);
      // what may remain is parquet schema inference on DataFrame
      // construction (a driver-side footer read Spark runs as a tiny
      // job) — assert no action-shaped job ran
      val actions = descs.toArray.map(String.valueOf(_))
        .filterNot(d => d.contains("parquet at"))
      withClue(s"unexpected driver actions: ${actions.mkString(" | ")}: ") {
        actions shouldBe empty
      }
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }

    // an append moves the corpus fingerprint → the width re-derives
    // from the advanced df artifact (and the sketch stays correct)
    writeDocs(corpus, "append", docsB: _*)
    val (sk3, w3) = SketchStore.cmsAdaptive(spark, sf, "documents")
    w3 should be >= w1
    assert(rows(sk3) === rows(CountMin.build(toks(corpus),
      col("term"), SketchStore.Depth, w3)))
  }
}
