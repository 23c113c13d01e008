package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class HardNegativesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, dir, "embeddings")
  private lazy val codebook = IvfKnn.trainCodebook(emb, "vec_id", "embedding",
    k = 4, iters = 2)
  private lazy val assigned = IvfKnn.assignCells(emb, "embedding",
    IvfKnn.collectCodebook(codebook, "cell"), "_cell")

  test("no returned negative shares the query's label") {
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    HardNegatives.topK(assigned, assigned.filter(col("vec_id") < 3),
        "vec_id", "_cell", "embedding", "label", k = 10, nprobe = 2)
      .select("query_id", "neighbor_id").collect()
      .foreach { r =>
        assert(labels(r.getLong(0)) != labels(r.getLong(1)),
          s"${r.getLong(1)} shares label with query ${r.getLong(0)}")
      }
  }

  test("negatives are top-k AMONG negatives, not negatives among top-k") {
    // probing every cell makes the candidate set exhaustive, so the
    // result must equal brute-force filtered-then-ranked
    val nCells = codebook.count().toInt
    val got = HardNegatives.topK(assigned, assigned.filter(col("vec_id") < 3),
        "vec_id", "_cell", "embedding", "label", k = 5, nprobe = nCells)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"),
        VectorOps.asDouble(col("embedding")).as("_q"), col("label").as("_ql"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(VectorOps.cosine(col("_q"), col("_c")).desc, col("vec_id"))
    val expected = emb.select(col("vec_id"),
        VectorOps.asDouble(col("embedding")).as("_c"), col("label"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id") && col("label") =!= col("_ql"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= 5)
      .select("query_id", "vec_id", "r")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got shouldBe expected
  }
}
