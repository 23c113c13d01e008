package graft.functions

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ArtifactStore

/** The persisted hashed TF-IDF feature artifact: a fresh build equals
  * the inline vectorization bit-for-bit (what keeps the t27/v22
  * oracles honest over the store-served path); an append advances
  * O(new) under the generation-pinned-idf contract (old rows
  * byte-untouched, new rows vectorized with the pre-append df/N);
  * drift is measurable and [[TfIdfStore.refresh]] erases it; the
  * pruned retrieval over stored norms/ceilings/stats equals the naive
  * retrieval exactly; and serving runs zero corpus scans.
  */
class TfIdfStoreSpec extends SparkSpec {
  import spark.implicits._

  private def newCorpus(tag: String): (String, String) = {
    val sf = Files.createTempDirectory(s"graft-tfidf-$tag").toString
    (sf, s"$sf/documents.parquet")
  }

  private def writeDocs(corpus: String, mode: String, docs: (Long, String)*): Unit =
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode(mode).parquet(corpus)

  private def inline(corpus: String) =
    HashedTfIdf.sparseFeatures(
      spark.read.parquet(corpus), "doc_id", col("text"), dim = 1024)

  private def baseFiles(corpus: String): Map[String, (Long, Long)] = {
    val base = Paths.get(ArtifactStore.root,
      ArtifactStore.pathKey(corpus) + "_tfidf1024", "feats", "base")
    val s = Files.walk(base)
    try s.filter(f => Files.isRegularFile(f)).toArray.toSeq
      .map(_.asInstanceOf[Path])
      .map(f => f.toString ->
        ((Files.size(f), Files.getLastModifiedTime(f).toMillis)))
      .toMap
    finally s.close()
  }

  /** Stored norms ≡ sqrt(Σw²) over the stored feature rows, modulo
    * the summation-order ulp (the served parquet scan reorders the
    * float sum relative to the builder's aggregation; retrieval
    * rounds cosines to 4 decimals, far above a 1-ulp norm shift).
    */
  private def assertNormsAgree(feats: org.apache.spark.sql.DataFrame,
      norms: org.apache.spark.sql.DataFrame): Unit = {
    val nrm = norms.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fromFeats = feats.groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(nrm.keySet === fromFeats.keySet)
    nrm.foreach { case (id, v) =>
      assert(math.abs(v - fromFeats(id)) < 1e-9, s"norm mismatch for $id")
    }
  }

  private val docsA = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "a quick brown dog outpaces a lazy fox",
    3L -> "entirely unrelated text about spark query planning",
    4L -> "spark query planning with catalyst and tungsten",
    5L -> "the lazy dog sleeps while the quick fox runs")

  test("fresh build equals inline vectorization bit-for-bit; serve scans no corpus") {
    val (sf, corpus) = newCorpus("fresh")
    writeDocs(corpus, "overwrite", docsA: _*)
    val stored = TfIdfStore.features(spark, sf)
    assert(stored.collect().map(_.toSeq).toSet ===
      inline(corpus).collect().map(_.toSeq).toSet)
    // norms/ceilings agree with aggregates over the stored rows (to
    // the ulp — parquet scan order reorders the float sum)
    assertNormsAgree(stored, TfIdfStore.norms(spark, sf))
    // zero corpus scans in any serve plan: every file read is under
    // the artifact root (the gate-input contract — no pre-decision
    // corpus jobs)
    Seq(stored, TfIdfStore.norms(spark, sf), TfIdfStore.ceilings(spark, sf),
        TfIdfStore.stats(spark, sf)).foreach { df =>
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

  test("append advances O(new) with pinned idf; refresh re-vectorizes") {
    val (sf, corpus) = newCorpus("append")
    writeDocs(corpus, "overwrite", docsA: _*)
    val before = TfIdfStore.features(spark, sf).collect().map(_.toSeq).toSet
    val filesBefore = baseFiles(corpus)
    writeDocs(corpus, "append",
      6L -> "quick spark fox planning never sleeps",
      7L -> "a brand new document with unseen tokens")
    val after = TfIdfStore.features(spark, sf)
    // base untouched: the increment wrote only a delta generation
    assert(baseFiles(corpus) === filesBefore)
    // old rows are EXACTLY the pinned pre-append vectors
    val afterRows = after.collect().map(_.toSeq).toSet
    assert(before.subsetOf(afterRows))
    // new docs present, vectorized under the PRE-append df/N: their
    // rows differ from a fresh whole-corpus vectorization wherever a
    // shared token's df shifted — that drift is the documented
    // contract, nonzero here and measured by driftReport
    assert(after.where(col("doc_id") >= 6L).count() > 0)
    val drift = TfIdfStore.driftReport(spark, sf).head
    assert(drift.getDouble(0) > 0.0)
    // norms stay self-consistent with the STORED weights (retrieval
    // exactness is against the store, not against fresh idf)
    assertNormsAgree(after, TfIdfStore.norms(spark, sf))
    // refresh = offline retrain: fresh stats, drift back to zero.
    // The threshold hook refuses below the bar, fires above it
    assert(!TfIdfStore.refreshIfDrifted(spark, sf, maxMeanAbsDw = 1e9))
    assert(TfIdfStore.refreshIfDrifted(spark, sf,
      maxMeanAbsDw = drift.getDouble(1) / 2))
    assert(TfIdfStore.features(spark, sf).collect().map(_.toSeq).toSet ===
      inline(corpus).collect().map(_.toSeq).toSet)
    assert(TfIdfStore.driftReport(spark, sf).head.getDouble(0) === 0.0)
  }

  test("artifact-only drift bound dominates the exact report; its plan scans no corpus") {
    val (sf, corpus) = newCorpus("drift")
    writeDocs(corpus, "overwrite", docsA: _*)
    // fresh build: pinned idf == current idf, bound exactly zero
    TfIdfStore.driftBound(spark, sf).head.getDouble(0) shouldBe 0.0
    // shifted append: heavy repeats of shared tokens move df/N hard
    writeDocs(corpus, "append",
      6L -> "quick quick quick spark spark fox fox fox planning",
      7L -> "quick fox quick fox quick fox spark spark spark",
      8L -> "fox fox fox quick quick spark planning planning")
    val exact = TfIdfStore.driftReport(spark, sf).head.getDouble(1)
    val bound = TfIdfStore.driftBound(spark, sf).head.getDouble(0)
    assert(exact > 0.0, "fixture must actually drift")
    assert(bound >= exact,
      s"bound $bound must dominate the exact mean $exact")
    // the check that guards a corpus-sized job must not run one: every
    // scan in the bound's plan is under the artifact root
    val scans = TfIdfStore.driftBound(spark, sf)
      .queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten
    assert(scans.nonEmpty)
    scans.foreach(p => assert(p.contains(ArtifactStore.root),
      s"drift check scans outside the store: $p"))
    // the gate fires on the bound wherever the exact report would
    // (bound >= exact), and a refresh zeroes it again
    assert(TfIdfStore.refreshIfDrifted(spark, sf, maxMeanAbsDw = exact / 2))
    TfIdfStore.driftBound(spark, sf).head.getDouble(0) shouldBe 0.0

    // GROWTH-INVARIANT reset (the driftparts ledger is
    // O(|vocab| x gens-since-refresh), bounded by this very gate):
    // after the gate-fired refresh the ledger holds exactly ONE
    // generation's rows — one (tok, tfsum, idfp) row per token, and
    // zero live delta generations
    val dpRoot = Paths.get(ArtifactStore.root,
      ArtifactStore.pathKey(corpus) + "_tfidf1024", "driftparts")
    val dpBase = new graft.sources.ParquetTableIO(
      dpRoot.resolve("base").toString).read(spark)
    dpBase.groupBy("tok").count()
      .agg(max("count")).head.getLong(0) shouldBe 1L
    val dpDelta = dpRoot.resolve("delta")
    assert(!Files.exists(dpDelta) || {
      val s = Files.list(dpDelta)
      try s.filter(_.getFileName.toString.startsWith("_gen=")).count() == 0L
      finally s.close()
    }, "refresh must drop every pinned delta generation")
  }

  test("pruned retrieval over stored norms/ceilings/stats equals naive exactly") {
    val (sf, corpus) = newCorpus("retr")
    writeDocs(corpus, "overwrite", docsA: _*)
    // append so ceilings/stats fold across generations too
    writeDocs(corpus, "append",
      6L -> "quick spark fox planning never sleeps",
      7L -> "catalyst tungsten planning for lazy queries")
    val f = TfIdfStore.features(spark, sf)
    val qf = f.where(col("doc_id").isin(1L, 4L))
      .withColumnRenamed("doc_id", "query_id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val naive = rows(HashedTfIdf.topKCosine(f, qf, k = 3))
    assert(rows(HashedTfIdf.topKCosinePrunedStored(f, qf, k = 3,
      norms = TfIdfStore.norms(spark, sf),
      ceilings = TfIdfStore.ceilings(spark, sf),
      stats = TfIdfStore.stats(spark, sf))) === naive)
    // force the pruned branch past the adaptive gates as well
    assert(rows(HashedTfIdf.topKCosinePrunedStored(f, qf, k = 3,
      norms = TfIdfStore.norms(spark, sf),
      ceilings = TfIdfStore.ceilings(spark, sf),
      stats = TfIdfStore.stats(spark, sf),
      fallbackFrac = Double.MaxValue)) === naive)
  }
}
