package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MmrRerankSpec extends SparkSpec {
  import spark.implicits._

  // query along +x; 1 and 2 are the same direction (sim = 1), 3 is
  // orthogonal to them, all three equally relevant (cos = 1/sqrt 2 —
  // the 2x scaling of vector 2 is exact in floating point)
  private def fixture = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),   // the query
    (1L, Array(1f, 1f, 0f, 0f)),
    (2L, Array(2f, 2f, 0f, 0f)),   // exact duplicate direction of 1
    (3L, Array(1f, -1f, 0f, 0f)),  // orthogonal to 1 and 2
    (4L, Array(-1f, 0f, 0f, 0f))   // irrelevant
  ).toDF("vec_id", "embedding")

  test("MMR demotes the duplicate that pure relevance ranks second") {
    val e = fixture
    val got = MmrRerank.rerank(e, e.filter(col("vec_id") === 0),
      "vec_id", "embedding", poolK = 4, selectK = 3,
      lambda = 0.7, mu = 0.3)
      .orderBy("rank").collect().map(_.getLong(1))
    // relevance ties go 1, 2, 3 — MMR must pick the orthogonal 3
    // second (penalty 0) over the duplicate 2 (penalty mu * 1)
    got shouldBe Array(1L, 3L, 2L)
  }

  test("first pick is always the pure-relevance argmax and scores decrease") {
    val e = fixture
    val rows = MmrRerank.rerank(e, e.filter(col("vec_id") === 0),
      "vec_id", "embedding", poolK = 4, selectK = 4,
      lambda = 0.7, mu = 0.3).orderBy("rank").collect()
    rows.head.getLong(1) shouldBe 1L
    val scores = rows.map(_.getDouble(2))
    scores.sliding(2).foreach { case Array(a, b) => b should be <= a; case _ => }
  }

  test("lambda = 1 degenerates to the relevance ranking of the pool") {
    val e = fixture
    val got = MmrRerank.rerank(e, e.filter(col("vec_id") === 0),
      "vec_id", "embedding", poolK = 4, selectK = 4,
      lambda = 1.0, mu = 0.0)
      .orderBy("rank").collect().map(_.getLong(1))
    got shouldBe Array(1L, 2L, 3L, 4L)
  }

  test("selection is deterministic across runs") {
    val e = fixture
    def run() = MmrRerank.rerank(e, e.filter(col("vec_id") === 0),
      "vec_id", "embedding", 4, 3, 0.7, 0.3).collect().toSeq
    run() shouldBe run()
  }
}
