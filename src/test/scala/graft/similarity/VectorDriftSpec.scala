package graft.similarity

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ArtifactStore

/** Codebook drift: the pinned-books contract degrades GRADUALLY on a
  * drifting corpus, and the store must (a) measure the degradation
  * (per-generation mean angular quantization error vs the pinned
  * train-time baseline), (b) retrain past a threshold via an offline
  * rebuild that flips atomically, and (c) restore quantization
  * quality and retrieval recall afterward.
  */
class VectorDriftSpec extends SparkSpec {
  import spark.implicits._

  // jitter large enough (~5% of the base norm) that distinct members
  // of one direction have cosine clearly below 1, and INJECTIVE in id
  // within each group (mod-23 pattern, ids span < 23 per group) — the
  // exact-rescore top-1 is then uniquely the query's twin, never a
  // duplicate-vector or fp-noise tie
  private def vec(base: Array[Float], id: Long): Array[Float] =
    base.zipWithIndex.map { case (v, i) =>
      v + 0.05f * (((id * 13 + i * 7) % 23).toInt - 11) }
  private val dirA = Array(10f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)
  private val dirB = Array(0f, 10f, 0f, 0f, 0f, 1f, 0f, 0f)
  // the SHIFTED distribution: SIX clusters living in dimensions the
  // trained books never saw (radius-10 ring in dims 2-3, 30 degrees
  // apart). Stale books have ~no mass in those dims, so stale codes
  // are blind to the cluster structure; a retrain's codes capture it.
  private def shifted(id: Long): Array[Float] = {
    val theta = (id % 6).toDouble * math.Pi / 6.0
    vec(Array(0f, 0f, (10.0 * math.cos(theta)).toFloat,
      (10.0 * math.sin(theta)).toFloat, 0f, 0f, 1f, 0f), id)
  }

  // k = 8 cells/subspace: enough code resolution that a retrain can
  // encode the shifted mass's internal (jitter) structure — with a
  // too-small k every shifted vector shares one code and ADC ties
  // hide the retrain's effect
  private val recipe = VectorIndexStore.Recipe(
    coarseK = 2, coarseIters = 2, m = 2, subDim = 4, k = 8, iters = 2)

  private def writeVecs(corpus: String, mode: String,
      rows: Seq[(Long, Array[Float])]): Unit =
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode(mode).parquet(corpus)

  /** Set-overlap recall@10 of ADC retrieval (stored codes + books)
    * vs brute force, for probe queries from the SHIFTED distribution
    * — the ProductQuantizerSpec recall discipline: ADC candidate
    * quality is what stale books degrade.
    */
  private def recallAt10(sf: String, queryIds: Seq[Long]): Double = {
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val books = VectorIndexStore.books(spark, sf, "embeddings",
      "vec_id", "embedding", recipe)
    val codes = VectorIndexStore.index(spark, sf, "embeddings",
      "vec_id", "embedding", recipe)
    val got = ProductQuantizer.adcTopK(corpus, queries, "vec_id",
        "embedding", recipe.subDim, books, k = 10, coarseK = 12,
        storedCodes = Some(codes))
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = BruteForceKnn.topK(corpus, queries, "vec_id", "embedding",
        k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.intersect(exact).size.toDouble / exact.size
  }

  test("shifted append raises measured drift; retrain restores error and recall") {
    val sf = Files.createTempDirectory("graft-vdrift").toString
    val corpus = s"$sf/embeddings.parquet"
    // base corpus on HIGH ids: after the shifted append, a retrain's
    // deterministic lowest-id seeds come from the NEW distribution
    writeVecs(corpus, "overwrite", (1000 until 1064).map(i =>
      (i.toLong, vec(if (i % 2 == 0) dirA else dirB, i.toLong))))
    def drift() = VectorIndexStore.driftReport(spark, sf, "embeddings",
      "vec_id", "embedding", recipe).head

    // freshly trained: no appends, ratio exactly 1
    val d0 = drift()
    assert(d0.getDouble(3) === 1.0)
    val trainErr = d0.getDouble(0)

    // distribution-shifted append: 16 vectors on unseen dimensions
    writeVecs(corpus, "append", (0 until 48).map(i =>
      (i.toLong, shifted(i.toLong))))
    val d1 = drift()
    val newErr = d1.getDouble(2)
    assert(newErr > 10 * trainErr,
      s"shifted append must dominate train-time error ($newErr vs $trainErr)")
    assert(d1.getDouble(3) > 1.5)
    assert(d1.getDouble(1) > trainErr) // overall error rose too
    // queries from the shifted mass: stale books code the shifted
    // vectors near-arbitrarily, so the ADC candidate cut loses true
    // neighbors — recall@10 drops
    val probes = Seq(9L, 10L, 21L, 34L, 40L, 47L)
    val recallBefore = recallAt10(sf, probes)

    // under-threshold: no retrain runs
    assert(!VectorIndexStore.retrainIfDrifted(spark, sf, "embeddings",
      "vec_id", "embedding", recipe, threshold = 1e9))

    // the old artifact keeps serving while/after the retrain: capture
    // the pre-retrain codes version, retrain, then read the grace copy
    val key = "vecidx_vec_id_embedding_c2_ci2_m2_s4_k8_i2"
    val codesIO = new graft.sources.ParquetTableIO(Paths.get(
      ArtifactStore.root, ArtifactStore.pathKey(corpus) + "_" + key,
      "codes", "base").toString)
    val vBefore = codesIO.currentVersion
    // the pre-retrain BASE snapshot (the appended generation lives in
    // delta partitions, not the base)
    val baseRowsBefore = spark.read.parquet(codesIO.currentDir.get).count()

    assert(VectorIndexStore.retrainIfDrifted(spark, sf, "embeddings",
      "vec_id", "embedding", recipe, threshold = 1.5))

    // retrained: fresh books over the full corpus — drift gone,
    // overall error at or below the pre-retrain overall
    val d2 = drift()
    assert(d2.getDouble(3) === 1.0) // nothing appended since retrain
    assert(d2.getDouble(1) < d1.getDouble(1),
      "retrain must reduce the overall quantization error")
    // recall restored
    val recallAfter = recallAt10(sf, probes)
    assert(recallAfter > recallBefore,
      s"retrain must lift shifted-query recall ($recallBefore -> $recallAfter)")
    // grace window: the pre-retrain snapshot is still on disk and
    // readable (readers that resolved the old pointer finish fine)
    assert(codesIO.currentVersion > vBefore)
    val old = codesIO.versionDir(vBefore)
    assert(old.isDefined)
    assert(spark.read.parquet(old.get).count() === baseRowsBefore)
  }
}
