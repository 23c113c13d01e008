package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SemanticDecontamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, dir, "embeddings")
  private lazy val corpus = emb.filter(col("vec_id") >= 50)
  private lazy val bench = emb.filter(col("vec_id") < 50)
  private lazy val codebook = IvfKnn.trainCodebook(emb, "vec_id", "embedding",
    k = 8, iters = 2)

  test("exact contamination is always dropped; survivors never match a cell-mate") {
    // plant exact contamination: a corpus row whose embedding IS a
    // benchmark embedding (identical vectors share a cell by argmax
    // determinism, so the catch is guaranteed, not probabilistic)
    val planted = bench.limit(1).select(lit(999999L).as("vec_id"),
      col("embedding"), col("label"))
    val kept = SemanticDecontam.kept(corpus.unionByName(planted), bench,
      "vec_id", "embedding", minCosine = 0.99, codebook = codebook)
    kept.filter(col("vec_id") === 999999L).count() shouldBe 0L
  }

  test("survivors + dropped partition the corpus; benchmark rows never appear") {
    val kept = SemanticDecontam.kept(corpus, bench, "vec_id", "embedding",
      minCosine = 0.30, codebook = codebook)
    val keptIds = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.forall(_ >= 50L))
    assert(keptIds.size <= corpus.count())
    // a stricter threshold can only keep MORE rows (monotone in tau)
    val stricter = SemanticDecontam.kept(corpus, bench, "vec_id", "embedding",
      minCosine = 0.90, codebook = codebook)
    assert(stricter.count() >= kept.count())
  }
}
