package graft.similarity

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ArtifactStore

/** Incrementally-maintained IVFPQ index for batch corpus appends:
  * static builds are bit-identical to `CodebookStore.ivfpqIndex`
  * (so the v16/v17 oracles transfer), an append encodes only the new
  * vectors with the PINNED books (base files byte-untouched), and
  * retrieval finds vectors across generations.
  */
class VectorIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  // same fixture discipline as StreamingVectorIngestSpec: two
  // well-separated directions plus deterministic per-id jitter so
  // residual training is non-degenerate and nearest-by-cosine is
  // unambiguous
  private def vec(base: Array[Float], id: Long): Array[Float] =
    base.zipWithIndex.map { case (v, i) =>
      v + 0.02f * (((id * 7 + i * 3) % 5).toInt - 2) }
  private val dirA = Array(10f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)
  private val dirB = Array(0f, 10f, 0f, 0f, 0f, 1f, 0f, 0f)

  private val recipe = VectorIndexStore.Recipe(
    coarseK = 2, coarseIters = 2, m = 2, subDim = 4, k = 4, iters = 1)

  private def seedRows: Seq[(Long, Array[Float])] =
    (0 until 8).map(i =>
      (i.toLong, vec(if (i % 2 == 0) dirA else dirB, i.toLong)))

  private def writeVecs(corpus: String, mode: String,
      rows: Seq[(Long, Array[Float])]): Unit =
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode(mode).parquet(corpus)

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def codesBaseFiles(corpus: String, res: Boolean): Map[String, (Long, Long)] = {
    val key = "vecidx_vec_id_embedding_c2_ci2_m2_s4_k4_i1" + (if (res) "_res" else "")
    val base = Paths.get(ArtifactStore.root,
      ArtifactStore.pathKey(corpus) + "_" + key, "codes", "base")
    val s = Files.walk(base)
    try s.filter(f => Files.isRegularFile(f)).toArray.toSeq
      .map(_.asInstanceOf[Path])
      .map(f => f.toString ->
        ((Files.size(f), Files.getLastModifiedTime(f).toMillis)))
      .toMap
    finally s.close()
  }

  test("static build is bit-identical to CodebookStore.ivfpqIndex, both modes") {
    val sf = Files.createTempDirectory("graft-vidx-static").toString
    writeVecs(s"$sf/embeddings.parquet", "overwrite", seedRows)
    rowsOf(VectorIndexStore.index(spark, sf, "embeddings",
      "vec_id", "embedding", recipe)) shouldBe
      rowsOf(CodebookStore.ivfpqIndex(spark, sf, "embeddings",
        "vec_id", "embedding", 2, 2, 2, 4, 4, 1))
    rowsOf(VectorIndexStore.index(spark, sf, "embeddings",
      "vec_id", "embedding", recipe.copy(residual = true))) shouldBe
      rowsOf(CodebookStore.ivfpqResidualIndex(spark, sf, "embeddings",
        "vec_id", "embedding", 2, 2, 2, 4, 4, 1))
  }

  test("append encodes only new vectors with pinned books; cross-generation retrieval") {
    val sf = Files.createTempDirectory("graft-vidx-append").toString
    val corpus = s"$sf/embeddings.parquet"
    writeVecs(corpus, "overwrite", seedRows)
    def idx() = VectorIndexStore.index(spark, sf, "embeddings",
      "vec_id", "embedding", recipe)
    val before = rowsOf(idx())
    val booksBefore = VectorIndexStore.books(spark, sf, "embeddings",
      "vec_id", "embedding", recipe)
    val baseBefore = codesBaseFiles(corpus, res = false)

    // ids chosen so the (id*7 + 3i) mod 5 jitter pattern differs from
    // every same-direction seed — the appended vectors are unique, and
    // an equal-vector query resolves to them, not to a seed tie
    val appended = Seq(103L -> vec(dirA, 103L), 104L -> vec(dirB, 104L))
    writeVecs(corpus, "append", appended)
    val after = rowsOf(idx())
    after.size shouldBe 10
    before.subsetOf(after) shouldBe true // old codes byte-equal
    codesBaseFiles(corpus, res = false) shouldBe baseBefore
    VectorIndexStore.books(spark, sf, "embeddings",
      "vec_id", "embedding", recipe) shouldBe booksBefore // pinned

    // retrieval through the incrementally-grown index: a query equal
    // to appended vector 103 must find it (exact rescore, cos = 1)
    val corpusDf = (seedRows ++ appended).toDF("vec_id", "embedding")
    val queries = Seq(999L -> vec(dirA, 103L)).toDF("vec_id", "embedding")
    val probeBook = VectorIndexStore.coarse(spark, sf, "embeddings",
      "vec_id", "embedding", recipe).toDF("cell", "centroid")
    val got = ProductQuantizer.ivfAdcTopK(corpusDf, queries, "vec_id",
        "embedding", subDim = 4, booksBefore, idx(), "_cell", probeBook,
        k = 1, coarseK = 4, nprobe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    got shouldBe Array((999L, 103L))

    // compaction folds deltas; the served view is unchanged
    VectorIndexStore.compact(spark, corpus, "vec_id", "embedding", recipe)
    rowsOf(idx()) shouldBe after
  }

  test("non-append rewrite keys a full rebuild: books retrain, nothing stale") {
    val sf = Files.createTempDirectory("graft-vidx-rebuild").toString
    val corpus = s"$sf/embeddings.parquet"
    writeVecs(corpus, "overwrite", seedRows)
    VectorIndexStore.index(spark, sf, "embeddings",
      "vec_id", "embedding", recipe).count() shouldBe 8

    writeVecs(corpus, "overwrite",
      (20 until 26).map(i => (i.toLong, vec(dirB, i.toLong))))
    val served = VectorIndexStore.index(spark, sf, "embeddings",
      "vec_id", "embedding", recipe)
    served.select("vec_id").as[Long].collect().sorted shouldBe
      (20L until 26L).toArray
  }
}
