package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BigramLmStoreSpec extends SparkSpec {
  import spark.implicits._

  test("stored counts fold to the inline model; append advances O(new)") {
    val sf = Files.createTempDirectory("lmstore").toString
    val corpus = s"$sf/documents.parquet"
    Seq((1L, "the cat sat on the mat"),
        (2L, "the cat sat on the hat"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    val c1 = BigramLmStore.counts(spark, sf, "documents")
      .as[(String, String, Long)].collect().map { case (a, b, c) => ((a, b), c) }.toMap
    c1(("the", "cat")) shouldBe 2L
    c1(("the", "mat")) shouldBe 1L

    val root = java.nio.file.Paths.get(
      graft.sources.ArtifactStore.root,
      graft.sources.ArtifactStore.pathKey(corpus) + "_bigram_lm")
    def baseFiles = {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.contains("/base/") &&
          p.toString.endsWith(".parquet"))
        .toArray.toSeq.map(_.toString).sorted
      finally s.close()
    }
    val before = baseFiles
    Seq((3L, "the dog sat on the mat"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(corpus)
    val c2 = BigramLmStore.counts(spark, sf, "documents")
      .as[(String, String, Long)].collect().map { case (a, b, c) => ((a, b), c) }.toMap
    c2(("the", "dog")) shouldBe 1L
    c2(("the", "mat")) shouldBe 2L
    c2(("sat", "on")) shouldBe 3L
    baseFiles shouldBe before // delta appended, base untouched
  }

  test("OOV semantics: every probability strictly positive, no -inf/NaN") {
    val sf = Files.createTempDirectory("lmstore-oov").toString
    Seq((1L, "alpha beta gamma alpha beta"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$sf/documents.parquet")
    val batch = Seq(
      (10L, "alpha beta gamma"), // fully in-model
      (11L, "alpha zebra"), // seen context, unseen pair+word
      (12L, "qq rr ss tt")) // fully OOV
      .toDF("doc_id", "text")
    val out = BigramLmStore.scoreBatch(spark, sf, "documents", batch, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    out.length shouldBe 3
    out.foreach { case (_, n, lp) =>
      assert(n > 0)
      assert(!lp.isNaN && !lp.isInfinite && lp < 0.0)
    }
    val byId = out.map(t => t._1 -> t._3).toMap
    // in-model text outscores pure OOV
    assert(byId(10L) > byId(12L))
  }

  test("empty model: scores are the defined ceiling (0.0), never null/inf") {
    val sf = Files.createTempDirectory("lmstore-empty").toString
    // no document has >= 2 tokens: the stored model has zero bigrams
    Seq((1L, "solo"), (2L, ""))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$sf/documents.parquet")
    val out = BigramLmStore.scoreBatch(spark, sf, "documents",
        Seq((10L, "any text here")).toDF("doc_id", "text"), "doc_id")
      .collect()
    out.length shouldBe 1
    val lp = out.head.getDouble(2)
    // T = V = 0 floors the backoff denominator: every P = 1, mean 0.0
    assert(!out.head.isNullAt(2) && !lp.isNaN && !lp.isInfinite)
    lp shouldBe 0.0
  }

  test("slice-scoped model: corpusFilter restricts the stored counts") {
    val sf = Files.createTempDirectory("lmstore-slice").toString
    Seq((1L, "aa bb cc"), (300L, "xx yy zz"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$sf/documents.parquet")
    val c = BigramLmStore.counts(spark, sf, "documents",
      corpusFilter = col("doc_id") < 250)
      .select("w1").as[String].collect().toSet
    c shouldBe Set("aa", "bb")
  }
}
