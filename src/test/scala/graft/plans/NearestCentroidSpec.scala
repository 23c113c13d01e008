package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.{IvfKnn, VectorOps}

class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private val codebook = Seq(
    0 -> Seq(1.0, 0.0, 0.0),
    1 -> Seq(0.0, 1.0, 0.0),
    2 -> Seq(0.0, 0.0, 1.0))

  test("assigns each vector to its max-cosine cell") {
    val df = Seq(
      (1L, Seq(0.9f, 0.1f, 0f)),
      (2L, Seq(0.1f, 0.9f, 0.2f)),
      (3L, Seq(0f, 0f, 5f))).toDF("id", "e")
    val got = IvfKnn.assignCells(df, "e", codebook, "c")
      .select("id", "c").as[(Long, Int)].collect().toMap
    got shouldBe Map(1L -> 0, 2L -> 1, 3L -> 2)
  }

  test("cosine ties resolve to the lowest cell id") {
    val df = Seq((1L, Seq(1f, 1f, 0f))).toDF("id", "e") // equidistant 0/1
    IvfKnn.assignCells(df, "e", codebook, "c")
      .select("c").as[Int].collect() shouldBe Array(0)
    // and independent of codebook declaration order
    IvfKnn.assignCells(df, "e", codebook.reverse, "c")
      .select("c").as[Int].collect() shouldBe Array(0)
  }

  test("per-cell cosine is bit-identical to graft_cosine (argmax consistency)") {
    GraftFunctions.ensureRegistered(spark)
    val df = (0 until 200).map { i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 31 + j * 17) % 13 - 6).toFloat / 3f))
    }.toDF("id", "e")
    val cb = (0 until 23).map(c =>
      c -> Seq.tabulate(8)(j => ((c * 7 + j * 5) % 11 - 5).toDouble / 4.0))
    val native = IvfKnn.assignCells(df, "e", cb, "cell").select("id", "cell")
    // reference argmax via the independently-tested cosine expression
    val best = array_max(array(cb.map { case (cell, vec) =>
      struct(VectorOps.cosineNative(col("e"), typedlit(vec)).as("cos"),
        lit(-cell).as("neg"))
    }: _*))
    val viaCos = df.select(col("id"), (best.getField("neg") * -1).cast("int").as("cell"))
    assertSameRows(native, viaCos)
  }

  test("null embedding, null element, and empty embedding yield null") {
    val df = Seq(
      (1L, null.asInstanceOf[Seq[java.lang.Float]]),
      (2L, Seq[java.lang.Float](1f, null, 0f)),
      (3L, Seq[java.lang.Float]())).toDF("id", "e")
    val got = IvfKnn.assignCells(df, "e", codebook, "c")
      .select("c").collect().map(_.isNullAt(0))
    got shouldBe Array(true, true, true)
  }

  test("zero-norm embedding and mismatched-length centroids are never selected") {
    val df = Seq((1L, Seq(0f, 0f, 0f)), (2L, Seq(1f, 0f))).toDF("id", "e")
    val got = IvfKnn.assignCells(df, "e", codebook, "c")
      .select("c").collect().map(_.isNullAt(0))
    got shouldBe Array(true, true) // no selectable cell -> null
  }

  test("null inner arrays in the centroids literal fail descriptively, not with an NPE") {
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val df = Seq((1L, Seq(1.0f, 0.0f))).toDF("id", "e")
    val bad = df.withColumn("c", call_function("graft_nearest_centroid",
      col("e"),
      typedlit(Seq(Some(Seq(1.0, 0.0)), Option.empty[Seq[Double]])),
      typedlit(Seq(0, 1))))
    val ex = intercept[Exception](bad.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    withClue(ex.toString) {
      assert(messages(ex).exists(_.contains("must not contain null")))
    }
  }

  test("interpreted eval matches codegen") {
    val df = Seq((1L, Seq(0.9f, 0.1f, 0f)), (2L, Seq(0f, 1f, 0.4f))).toDF("id", "e")
    val withCodegen = IvfKnn.assignCells(df, "e", codebook, "c")
      .select("id", "c").as[(Long, Int)].collect().toMap
    val saved = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = IvfKnn.assignCells(df, "e", codebook, "c")
        .select("id", "c").as[(Long, Int)].collect().toMap
      interpreted shouldBe withCodegen
    } finally spark.conf.set("spark.sql.codegen.factoryMode", saved)
  }

  test("codebooks with hundreds of cells stay fast (no janino blowup)") {
    val dim = 64
    val cb = (0 until 256).map(c =>
      c -> Seq.tabulate(dim)(j => math.sin(c * dim + j)))
    val df = spark.range(2000).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(col("id") * 37 + j * 13, lit(19)) - 9).cast("float")).as("e"))
    val t0 = System.nanoTime()
    IvfKnn.assignCells(df, "e", cb, "c").groupBy("c").count().count()
    val sec = (System.nanoTime() - t0) / 1e9
    withClue(f"k=256 over 2k rows took $sec%.1f s: ")(assert(sec < 30))
  }
}
