package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine on known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(3.0f, 4.0f)))
      .toDF("x", "y", "z")
    val r = df.select(
      VectorOps.cosine(VectorOps.asDouble(col("x")), VectorOps.asDouble(col("x"))).as("xx"),
      VectorOps.cosine(VectorOps.asDouble(col("x")), VectorOps.asDouble(col("y"))).as("xy"),
      VectorOps.norm(VectorOps.asDouble(col("z"))).as("nz")).collect().head
    r.getDouble(0) shouldBe 1.0 +- 1e-12
    r.getDouble(1) shouldBe 0.0 +- 1e-12
    r.getDouble(2) shouldBe 5.0 +- 1e-12
  }
}

class KnnAndLshSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("brute-force knn returns k ranked rows per query, self excluded") {
    val out = BruteForceKnn.topK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
    val byQ = out.groupBy("query_id").count().collect()
    byQ.length shouldBe 3
    all(byQ.map(_.getLong(1))) shouldBe 5L
    out.filter(col("query_id") === col("neighbor_id")).count() shouldBe 0
    // ranks are 1..5 and cosine is non-increasing in rank
    val r = out.filter(col("query_id") === 0).orderBy("rank")
      .select("cos").collect().map(_.getDouble(0))
    r.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
  }

  test("multi-table sign-LSH: candidates shrink the pair space, recall is usable") {
    val n = emb.count()
    val allPairs = n * (n - 1) / 2
    val threshold = 0.3
    val planes = SignLSH.planes(dim = 64, bits = 6, tables = 8, seed = 11L)

    val exact = SimilarityQueriesHelper.exactPairs(spark, emb, threshold)
    val approx = SignLSH.annPairs(emb, "vec_id", "embedding", threshold, planes)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = SignLSH.candidatePairs(emb, "vec_id", "embedding", planes).count()

    assert(cands < allPairs / 2,
      s"LSH should prune the pair space: $cands candidates vs $allPairs pairs")
    approx.subsetOf(exact) shouldBe true // refinement never invents pairs
    val recall = if (exact.isEmpty) 1.0 else approx.size.toDouble / exact.size
    assert(recall >= 0.3, f"8-table/6-bit recall too low: $recall%.2f " +
      s"(${approx.size}/${exact.size} of $cands candidates)")
  }

  test("more tables => recall never decreases (monotone union of indexes)") {
    val t2 = SignLSH.planes(64, 6, 2, seed = 11L)
    val t8 = SignLSH.planes(64, 6, 8, seed = 11L) // superset: same seed prefix
    val p2 = SignLSH.annPairs(emb, "vec_id", "embedding", 0.3, t2).count()
    val p8 = SignLSH.annPairs(emb, "vec_id", "embedding", 0.3, t8).count()
    assert(p8 >= p2, s"8 tables found $p8 < $p2 found by 2")
  }

  test("IVF with nprobe = all cells is EXACTLY brute force") {
    val nCells = emb.select("label").distinct().count().toInt
    val q = emb.filter(col("vec_id") < 3)
    val ivf = IvfKnn.topK(emb, q, "vec_id", "label", "embedding", k = 5, nprobe = nCells)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bf = BruteForceKnn.topK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    ivf shouldBe bf
  }

  test("heap-aggregate top-k equals the ranking-window top-k exactly") {
    val q = emb.filter(col("vec_id") < 4)
    val viaAgg = BruteForceKnn.topKAgg(emb, q, "vec_id", "embedding", 7)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaWindow = BruteForceKnn.topK(emb, q, "vec_id", "embedding", 7)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    viaAgg shouldBe viaWindow
  }

  test("IVF with nprobe < cells keeps k results and usable recall") {
    val q = emb.filter(col("vec_id") < 5)
    val ivf = IvfKnn.topK(emb, q, "vec_id", "label", "embedding", k = 10, nprobe = 2)
    val byQ = ivf.groupBy("query_id").count().collect()
    byQ.length shouldBe 5
    all(byQ.map(_.getLong(1))) shouldBe 10L
    val bf = BruteForceKnn.topK(emb, q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = ivf.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = hits.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.2, f"nprobe=2 recall unusably low: $recall%.2f")
  }
}

private object SimilarityQueriesHelper {
  def exactPairs(spark: org.apache.spark.sql.SparkSession,
      emb: org.apache.spark.sql.DataFrame, threshold: Double): Set[(Long, Long)] = {
    val e = emb.select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("e"))
    e.select(col("vec_id").as("id_a"), col("e").as("e_a"))
      .join(e.select(col("vec_id").as("id_b"), col("e").as("e_b")),
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorOps.cosine(col("e_a"), col("e_b")).as("c"))
      .filter(col("c") >= threshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }
}

class KMeansCodebookSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // three well-separated direction clusters (cosine k-means separates
  // by direction, not magnitude)
  private def clustered = (0 until 30).map { i =>
    val base = i % 3 match {
      case 0 => Seq(10.0, 0.1, 0.0)
      case 1 => Seq(0.0, 10.0, 0.1)
      case _ => Seq(0.1, 0.0, 10.0)
    }
    // deterministic jitter, small vs the separation
    (i.toLong, base.zipWithIndex.map { case (v, d) => (v + 0.01 * ((i * 7 + d) % 5)).toFloat })
  }.toDF("vec_id", "embedding")

  test("k-means recovers well-separated direction clusters deterministically") {
    val df = clustered
    val cb = IvfKnn.trainCodebook(df, "vec_id", "embedding", k = 3, iters = 5)
    cb.count() shouldBe 3
    val cents = IvfKnn.collectCodebook(cb, "cell")
    val assigned = IvfKnn.assignCells(df, "embedding", cents)
      .select(col("vec_id"), col("_cell")).as[(Long, Int)].collect().toMap
    // every member of a true cluster lands in the same learned cell
    (0 until 3).foreach { c =>
      val cells = (0 until 30).filter(_ % 3 == c).map(i => assigned(i.toLong)).toSet
      withClue(s"true cluster $c split across $cells: ")(cells.size shouldBe 1)
    }
    // and the three true clusters get three distinct cells
    (0 until 3).map(c => assigned(c.toLong)).toSet.size shouldBe 3
    // determinism: retraining reproduces the identical codebook
    val cents2 = IvfKnn.collectCodebook(
      IvfKnn.trainCodebook(df, "vec_id", "embedding", k = 3, iters = 5), "cell")
    cents2 shouldBe cents
  }

  test("persisted codebook (CodebookStore) is bit-identical to an inline train") {
    val dir = "/root/testdata/sf0.001"
    val stored = IvfKnn.collectCodebook(
      CodebookStore.trained(spark, dir, "embeddings",
        "vec_id", "embedding", k = 4, iters = 2), "cell")
    // second call reads the committed artifact, not a re-train
    val storedAgain = IvfKnn.collectCodebook(
      CodebookStore.trained(spark, dir, "embeddings",
        "vec_id", "embedding", k = 4, iters = 2), "cell")
    val inline = IvfKnn.collectCodebook(
      IvfKnn.trainCodebook(spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", k = 4, iters = 2), "cell")
    stored shouldBe inline
    storedAgain shouldBe inline
  }

  test("trained codebook + nprobe = k probes is exactly brute force") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = IvfKnn.trainCodebook(df, "vec_id", "embedding", k = 4, iters = 3)
    val cents = IvfKnn.collectCodebook(cb, "cell")
    val withCells = IvfKnn.assignCells(df, "embedding", cents)
    val q = withCells.filter(col("vec_id") < 3)
    val ivf = IvfKnn.topK(withCells, q, "vec_id", "_cell", "embedding", k = 5, nprobe = 4)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bf = BruteForceKnn.topK(df, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    ivf shouldBe bf
  }
}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("codes stay in [0,255]; reconstruction error bounded by scale/2") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Quantize.quantized(df, col("embedding"))
      .withColumn("recon",
        Quantize.dequantized(col("q"), col("q_mn"), col("q_scale")))
      .withColumn("max_code", array_max(col("q")))
      .withColumn("min_code", array_min(col("q")))
      .withColumn("max_err", array_max(zip_with(
        graft.similarity.VectorOps.asDouble(col("embedding")), col("recon"),
        (x, r) => abs(x - r))))
    val bad = q.filter(col("min_code") < 0 || col("max_code") > 255 ||
      col("max_err") > col("q_scale") / 2 * 1.0000001).count()
    bad shouldBe 0L
  }

  test("constant vector quantizes to all-zero codes with zero scale") {
    val df = Seq((1L, Array(0.25f, 0.25f, 0.25f))).toDF("vec_id", "embedding")
    val r = Quantize.quantized(df, col("embedding"))
      .select(col("q"), col("q_scale"), col("q_mse")).head()
    r.getSeq[Long](0) shouldBe Seq(0L, 0L, 0L)
    r.getDouble(1) shouldBe 0.0
    r.getDouble(2) shouldBe 0.0
  }

  test("quantized cosine preserves exact top-k ordering on real vectors") {
    // 4x-compressed vectors must rank neighbors like the exact ones do
    // at small k: reconstruct, re-rank, compare top-3 sets per query.
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val recon = Quantize.quantized(df, col("embedding"))
      .select(col("vec_id"),
        Quantize.dequantized(col("q"), col("q_mn"), col("q_scale")).as("embedding"))
    val q = df.filter(col("vec_id") < 3)
    def top3(corpus: org.apache.spark.sql.DataFrame,
        queries: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      BruteForceKnn.topK(corpus, queries, "vec_id", "embedding", 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = top3(df, q)
    val approx = top3(recon, recon.filter(col("vec_id") < 3))
    // overlap >= 2 of 3 per query: quantization noise may swap distant ties
    exact.foreach { case (qid, nbrs) =>
      (nbrs intersect approx(qid)).size should be >= 2
    }
  }
}

class RescoreTopKSpec extends SparkSpec {

  test("coarseK >= corpus makes quantized rescore exactly brute force") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = df.filter(col("vec_id") < 3)
    val rescored = Quantize.rescoreTopK(df, q, "vec_id", "embedding",
        k = 5, coarseK = 1000000)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bf = BruteForceKnn.topK(df, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    rescored shouldBe bf
  }

  test("narrow coarse stage still recovers most exact neighbors") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = df.filter(col("vec_id") < 3)
    def ids(r: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      r.select("query_id", "neighbor_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    val rescored = ids(Quantize.rescoreTopK(df, q, "vec_id", "embedding",
      k = 5, coarseK = 15))
    val bf = ids(BruteForceKnn.topK(df, q, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id")))
    bf.foreach { case (qid, nbrs) =>
      (nbrs intersect rescored(qid)).size should be >= 4
    }
  }
}

class MultiprobeLshSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private val planes = SignLSH.planes(dim = 64, bits = 8, tables = 1).head

  private def recallVsBruteForce(nprobe: Int): Double = {
    val q = emb.filter(col("vec_id") < 10)
    val mp = SignLSH.multiprobeTopK(emb, q, "vec_id", "embedding",
        k = 10, nprobe = nprobe, planes)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = BruteForceKnn.topK(emb, q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (bf.isEmpty) 1.0 else (mp intersect bf).size.toDouble / bf.size
  }

  test("nprobe=1 returns exactly the own-bucket candidates, ranked") {
    val q = emb.filter(col("vec_id") < 5)
    val got = SignLSH.multiprobeTopK(emb, q, "vec_id", "embedding",
        k = 1000, nprobe = 1, planes)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: explicit bucket filter per query
    val bucketed = emb.select(col("vec_id"),
      SignLSH.bucketOf(VectorOps.asDouble(col("embedding")), planes).as("b"))
    val qb = bucketed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("b"))
    val want = bucketed.join(qb, "b")
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe want
  }

  test("every probed neighbor's bucket is within Hamming 1 of the query bucket") {
    val q = emb.filter(col("vec_id") < 10)
    val bucketed = emb.select(col("vec_id"),
      SignLSH.bucketOf(VectorOps.asDouble(col("embedding")), planes).as("b"))
    val out = SignLSH.multiprobeTopK(emb, q, "vec_id", "embedding",
        k = 50, nprobe = 4, planes)
      .join(bucketed.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("b", "nb"), "neighbor_id")
      .join(bucketed.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("b", "qb"), "query_id")
      .select(bit_count(col("nb").bitwiseXOR(col("qb"))).as("d"))
      .collect().map(_.getInt(0))
    all(out) should be <= 1
  }

  test("recall is monotone in nprobe and nprobe=bits+1 probes the full Hamming-1 ball") {
    val r1 = recallVsBruteForce(1)
    val r4 = recallVsBruteForce(4)
    val r9 = recallVsBruteForce(9)
    assert(r4 >= r1 - 1e-9, s"recall fell: nprobe1=$r1 nprobe4=$r4")
    assert(r9 >= r4 - 1e-9, s"recall fell: nprobe4=$r4 nprobe9=$r9")
    // oversized nprobe caps at bits+1: identical result, no error
    recallVsBruteForce(100) shouldBe r9
  }

  test("deterministic: two runs are identical") {
    val q = emb.filter(col("vec_id") < 5)
    def run() = SignLSH.multiprobeTopK(emb, q, "vec_id", "embedding",
        k = 10, nprobe = 4, planes)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    run() shouldBe run()
  }

  test("maxFlips=2: neighbors within Hamming 2, recall >= Hamming-1 at full ball") {
    val q = emb.filter(col("vec_id") < 10)
    val bucketed = emb.select(col("vec_id"),
      SignLSH.bucketOf(VectorOps.asDouble(col("embedding")), planes).as("b"))
    val out = SignLSH.multiprobeTopK(emb, q, "vec_id", "embedding",
        k = 50, nprobe = 37, planes, maxFlips = 2) // own + 8 singles + 28 doubles
      .join(bucketed.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("b", "nb"), "neighbor_id")
      .join(bucketed.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("b", "qb"), "query_id")
      .select(bit_count(col("nb").bitwiseXOR(col("qb"))).as("d"))
      .collect().map(_.getInt(0))
    all(out) should be <= 2
    // the full Hamming-2 ball finds at least as many true neighbors
    // as the full Hamming-1 ball
    recallVsBruteForce(9) should be <= {
      val mp2 = SignLSH.multiprobeTopK(emb, q, "vec_id", "embedding",
          k = 10, nprobe = 37, planes, maxFlips = 2)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val bf = BruteForceKnn.topK(emb, q, "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      if (bf.isEmpty) 1.0 else (mp2 intersect bf).size.toDouble / bf.size
    } + 1e-9
  }

  test("maxFlips=2 with nprobe <= bits+1 ranks singles and doubles together") {
    // a double flip with tiny margins can outrank a single with a big
    // one: the probe SET is score-ranked, not depth-staged; at
    // nprobe=9 the h1 and h2 variants may legitimately differ, but
    // both stay within their Hamming balls and both are deterministic
    val q = emb.filter(col("vec_id") < 5)
    def run() = SignLSH.multiprobeTopK(emb, q, "vec_id", "embedding",
        k = 10, nprobe = 9, planes, maxFlips = 2)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    run() shouldBe run()
  }
}
