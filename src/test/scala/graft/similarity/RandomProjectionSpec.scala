package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(11)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("projection is linear: proj(2v) = 2 proj(v), so projected cosine is scale-invariant") {
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val ps = RandomProjection.planes(8, 4, seed = 3L)
    val df = Seq((1L, Array(1f, 2f, -1f, 0.5f, 3f, -2f, 1f, 4f)))
      .toDF("vec_id", "embedding")
      .withColumn("doubled", transform(col("embedding"),
        x => (x * 2.0f).cast("float")))
    val r = df.select(
      RandomProjection.project(col("embedding"), ps).as("p"),
      RandomProjection.project(col("doubled"), ps).as("p2")).head()
    val p = r.getSeq[Double](0); val p2 = r.getSeq[Double](1)
    p.zip(p2).foreach { case (a, b) => b shouldBe (2 * a +- 1e-9) }
  }

  test("prefilterK >= n-1 degenerates to exact brute-force top-k") {
    val df = vecs(40, 16)
    val ps = RandomProjection.planes(16, 4, seed = 5L)
    val q = df.filter(col("vec_id") < 3)
    val got = RandomProjection
      .prefilterTopK(df, q, "vec_id", "embedding", ps, prefilterK = 39, k = 5)
      .select("query_id", "neighbor_id", "rank")
    val exact = BruteForceKnn.topK(df, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank")
    assertSameRows(got, exact)
  }

  test("a narrow prefilter still recovers most true neighbors (JL distance preservation)") {
    val df = vecs(200, 32)
    val ps = RandomProjection.planes(32, 16, seed = 5L)
    val q = df.filter(col("vec_id") < 5)
    val got = RandomProjection
      .prefilterTopK(df, q, "vec_id", "embedding", ps, prefilterK = 40, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = BruteForceKnn.topK(df, q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got & exact).size.toDouble / exact.size
    recall should be >= 0.7
  }

  test("deterministic: two runs give identical rows") {
    val df = vecs(60, 16)
    val ps = RandomProjection.planes(16, 8)
    val q = df.filter(col("vec_id") === 0)
    def run() = RandomProjection
      .prefilterTopK(df, q, "vec_id", "embedding", ps, 20, 5)
      .collect().toSeq.map(_.toString)
    run() shouldBe run()
  }
}

class MatVecSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("matvec is bit-identical to per-plane native dots, float and double inputs") {
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val ps = RandomProjection.planes(16, 5, seed = 9L)
    val rnd = new scala.util.Random(2)
    val df = (0 until 30).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("id", "emb")
    val both = df.select(
      VectorOps.matVecNative(col("emb"), ps.flatten).as("mv"),
      array(ps.map(p => VectorOps.dotNative(col("emb"), typedlit(p))): _*)
        .as("pp"))
      .collect()
    both.foreach { r =>
      r.getSeq[Double](0) shouldBe r.getSeq[Double](1) // bit-equal
    }
  }

  test("matvec null semantics: indivisible matrix length and empty vector -> null") {
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val df = Seq((1L, Array(1f, 2f, 3f))).toDF("id", "emb")
    df.select(VectorOps.matVecNative(col("emb"), Seq(1.0, 2.0)).as("mv"))
      .head().isNullAt(0) shouldBe true
    val empty = Seq((1L, Array.empty[Float])).toDF("id", "emb")
    empty.select(VectorOps.matVecNative(col("emb"), Seq(1.0)).as("mv"))
      .head().isNullAt(0) shouldBe true
  }
}
