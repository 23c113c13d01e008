package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Properties of the PQ + ADC retrieval path. The two exactness-
  * recovery limits pin the arithmetic end to end: (a) coarseK ≥ n
  * makes the final ranking EXACTLY brute force regardless of code
  * quality (the rescore plumbing); (b) m=1, k=n, iters=0 makes the
  * codebook the corpus itself, so the ADC score IS the exact inner
  * product (the LUT/scan plumbing).
  */
class ProductQuantizerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, dir, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 3)

  test("codes are bounded by the codebook and cover every vector") {
    val books = ProductQuantizer.train(emb, "vec_id", "embedding",
      m = 4, subDim = 16, k = 4, iters = 1)
    books should have size 4
    books.foreach(_.codebook should have size 4)
    val coded = ProductQuantizer.encoded(emb, "embedding", 16, books)
    val n = emb.count()
    coded.count() shouldBe n
    (0 until 4).foreach { s =>
      coded.filter(col(s"pq_$s").isNull || col(s"pq_$s") < 0 || col(s"pq_$s") >= 4)
        .count() shouldBe 0L
    }
  }

  test("train refuses a recipe/dim mismatch loudly") {
    val e = intercept[IllegalArgumentException] {
      ProductQuantizer.train(emb, "vec_id", "embedding",
        m = 4, subDim = 20, k = 4, iters = 0)
    }
    e.getMessage should include("embedding dim")
  }

  test("coarseK >= n recovers exact brute-force cosine top-k") {
    val books = ProductQuantizer.train(emb, "vec_id", "embedding",
      m = 4, subDim = 16, k = 4, iters = 1)
    val got = ProductQuantizer.adcTopK(emb, queries, "vec_id", "embedding",
        subDim = 16, books, k = 5, coarseK = emb.count().toInt)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = BruteForceKnn.topK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got shouldBe expected
  }

  test("m=1, k=n, iters=0: ADC is the exact inner product") {
    val n = emb.count().toInt
    val books = ProductQuantizer.train(emb, "vec_id", "embedding",
      m = 1, subDim = 64, k = n, iters = 0)
    // every vector is its own centroid (cosine self-similarity is
    // maximal), so the candidate set is the exact top-coarseK by dot
    val got = ProductQuantizer.adcTopK(emb, queries, "vec_id", "embedding",
        subDim = 64, books, k = 10, coarseK = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qs = queries.select(col("vec_id").as("query_id"),
      VectorOps.asDouble(col("embedding")).as("_q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(round(VectorOps.dotNative(col("_q"), col("_c")), 6).desc, col("vec_id"))
    val expected = emb.select(col("vec_id"),
        VectorOps.asDouble(col("embedding")).as("_c"))
      .crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= 10)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe expected
  }

  test("stored PQ books are bit-identical to the inline train") {
    val inline = ProductQuantizer.train(emb, "vec_id", "embedding",
      m = 4, subDim = 16, k = 4, iters = 1)
    val stored = CodebookStore.pqTrained(spark, dir, "embeddings",
      "vec_id", "embedding", m = 4, subDim = 16, k = 4, iters = 1)
    stored shouldBe inline
    // second read serves the committed artifact (no retrain path)
    CodebookStore.pqTrained(spark, dir, "embeddings",
      "vec_id", "embedding", m = 4, subDim = 16, k = 4, iters = 1) shouldBe inline
  }

  test("pqTrained memoizes parsed books per process (same instance back)") {
    val a = CodebookStore.pqTrained(spark, dir, "embeddings",
      "vec_id", "embedding", m = 4, subDim = 16, k = 4, iters = 1)
    val b = CodebookStore.pqTrained(spark, dir, "embeddings",
      "vec_id", "embedding", m = 4, subDim = 16, k = 4, iters = 1)
    assert(a eq b, "second call should hit the per-process memo")
    CodebookStore.pqMemoSize should be >= 1
  }

  test("stored PQ codes match inline encoding row-for-row") {
    val books = CodebookStore.pqTrained(spark, dir, "embeddings",
      "vec_id", "embedding", m = 4, subDim = 16, k = 4, iters = 1)
    val cols = Seq("vec_id", "pq_0", "pq_1", "pq_2", "pq_3")
    val stored = CodebookStore.pqCodes(spark, dir, "embeddings",
        "vec_id", "embedding", m = 4, subDim = 16, k = 4, iters = 1)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val inline = ProductQuantizer.encoded(emb, "embedding", 16, books)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    stored shouldBe inline
  }

  test("IVFPQ with nprobe = |cells| equals flat ADC exactly") {
    val books = ProductQuantizer.train(emb, "vec_id", "embedding",
      m = 4, subDim = 16, k = 4, iters = 1)
    val coarse = IvfKnn.trainCodebook(emb, "vec_id", "embedding", k = 4, iters = 2)
    val assignedCodes = ProductQuantizer.encoded(
      IvfKnn.assignCells(emb, "embedding",
        IvfKnn.collectCodebook(coarse, "cell"), "_cell"),
      "embedding", 16, books)
      .select(col("vec_id") +: col("_cell") +:
        (0 until 4).map(i => col(s"pq_$i")): _*)
    val probeBook = IvfKnn.trainCodebook(emb, "vec_id", "embedding", k = 4, iters = 3)
    val gated = ProductQuantizer.ivfAdcTopK(emb, queries, "vec_id", "embedding",
        subDim = 16, books, assignedCodes, "_cell", probeBook,
        k = 10, coarseK = 30, nprobe = 4)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val flat = ProductQuantizer.adcTopK(emb, queries, "vec_id", "embedding",
        subDim = 16, books, k = 10, coarseK = 30)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    gated shouldBe flat
  }

  test("trained m=4/k=4 codes reach useful recall@10 at test scale") {
    val books = ProductQuantizer.train(emb, "vec_id", "embedding",
      m = 4, subDim = 16, k = 4, iters = 1)
    val got = ProductQuantizer.adcTopK(emb, queries, "vec_id", "embedding",
        subDim = 16, books, k = 10, coarseK = 50)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = BruteForceKnn.topK(emb, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@10 was $recall — PQ candidates lost the true neighbors")
  }
}
