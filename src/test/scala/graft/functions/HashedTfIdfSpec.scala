package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HashedTfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple banana apple"), // dup of 1 → identical features
    (4L, "unique words only here")).toDF("doc_id", "text")

  test("identical texts get identical sparse features") {
    val f = HashedTfIdf.sparseFeatures(docs, "doc_id", col("text"), dim = 64)
    val f1 = f.where(col("doc_id") === 1).select("bucket", "w")
    val f3 = f.where(col("doc_id") === 3).select("bucket", "w")
    assertSameRows(f1, f3)
  }

  test("tf and idf both shape the weight") {
    val f = HashedTfIdf.sparseFeatures(docs, "doc_id", col("text"), dim = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 'apple' appears 2x in doc 1 → |w| for apple's bucket is twice a
    // single occurrence of a token with the same df (df=2: banana)
    val n = 4.0
    def idf(df: Int) = math.log((n + 1) / (df + 1)) + 1
    val apples = f.filter { case (id, _, w) =>
      id == 1 && math.abs(math.abs(w) - 2 * idf(2)) < 1e-3 }
    apples.length shouldBe 1
    // rarer tokens weigh more: df=1 idf > df=3 idf
    assert(idf(1) > idf(3))
  }

  test("retrieval ranks the duplicate first, excludes self, k bounds rows") {
    val f = HashedTfIdf.sparseFeatures(docs, "doc_id", col("text"), dim = 64)
    val qf = f.where(col("doc_id") === 1).withColumnRenamed("doc_id", "query_id")
    val top = HashedTfIdf.topKCosine(f, qf, k = 2)
      .orderBy("rank").collect()
    assert(top.length <= 2)
    top.head.getAs[Long]("doc_id") shouldBe 3L // the exact duplicate
    top.head.getAs[Double]("cosine") shouldBe 1.0 +- 1e-9
    assert(!top.map(_.getAs[Long]("doc_id")).contains(1L)) // no self
  }

  test("max-score pruned retrieval is bit-identical to the naive path") {
    // randomized Zipf-ish corpora: frequent shared tokens (the
    // postings the pruning should skip) + rare discriminative ones;
    // seeds logged so a failure replays
    val common = Array("the", "of", "and", "data", "table", "scan")
    val rare = Array.tabulate(40)(i => s"rare$i")
    for (seed <- Seq(11L, 42L, 77L)) {
      val rnd = new scala.util.Random(seed)
      val corpus = (0L until 60L).map { i =>
        val nc = 3 + rnd.nextInt(4)
        val nr = 1 + rnd.nextInt(3)
        val words = Seq.fill(nc)(common(rnd.nextInt(common.length))) ++
          Seq.fill(nr)(rare(rnd.nextInt(rare.length)))
        (i, rnd.shuffle(words).mkString(" "))
      }.toDF("doc_id", "text")
      val f = HashedTfIdf.sparseFeatures(corpus, "doc_id", col("text"),
        dim = 512).localCheckpoint()
      val qf = f.where(col("doc_id") % 7 === 0)
        .withColumnRenamed("doc_id", "query_id")
      withClue(s"seed=$seed: ") {
        // fallbackFrac = Double.MaxValue pins the PRUNED branch (never fall back)
        // so the bound math itself is what equality certifies; the
        // default adaptive form must agree too
        assertSameRows(
          HashedTfIdf.topKCosinePruned(f, qf, k = 4, fallbackFrac = Double.MaxValue),
          HashedTfIdf.topKCosine(f, qf, k = 4))
        assertSameRows(
          HashedTfIdf.topKCosinePruned(f, qf, k = 4),
          HashedTfIdf.topKCosine(f, qf, k = 4))
      }
    }
  }

  test("pruned retrieval: fewer candidates than k, and tiny corpora, survive") {
    val f = HashedTfIdf.sparseFeatures(docs, "doc_id", col("text"), dim = 64)
    val qf = f.where(col("doc_id") === 1).withColumnRenamed("doc_id", "query_id")
    // k larger than the matchable corpus → θ never materializes
    assertSameRows(
      HashedTfIdf.topKCosinePruned(f, qf, k = 10, fallbackFrac = Double.MaxValue),
      HashedTfIdf.topKCosine(f, qf, k = 10))
  }

  test("a fleet past the gate cap degrades to the naive plan, same answer") {
    // the driver-collect guard: gateCap=1 with a multi-row query
    // feature set forces the capped-limit fallback; the result must
    // equal the naive path exactly
    val f = HashedTfIdf.sparseFeatures(docs, "doc_id", col("text"), dim = 64)
    val qf = f.where(col("doc_id") === 1).withColumnRenamed("doc_id", "query_id")
    assert(qf.count() > 1, "fixture must exceed the test cap")
    assertSameRows(
      HashedTfIdf.topKCosinePruned(f, qf, k = 2, gateCap = 1),
      HashedTfIdf.topKCosine(f, qf, k = 2))
  }

  test("minIdf drops ubiquitous tokens from the postings") {
    val every = Seq(
      (1L, "common alpha"), (2L, "common beta"), (3L, "common gamma"))
      .toDF("doc_id", "text")
    // 'common' has df=3=N → idf = ln(4/4)+1 = 1; rare tokens idf = ln(2)+1
    val f = HashedTfIdf.sparseFeatures(every, "doc_id", col("text"),
      dim = 4096, minIdf = 1.5)
    f.count() shouldBe 3 // one rare token per doc survives
  }
}
