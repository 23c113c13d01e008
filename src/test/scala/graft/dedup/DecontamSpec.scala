package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private def norm = col("text")

  test("wordGrams: sliding n-grams, short docs yield empty (not descending junk)") {
    val got = Seq("a b c d", "a b", "").toDF("text")
      .select(Decontam.wordGrams(col("text"), 3).as("g"))
      .as[Seq[String]].collect()
    got(0) shouldBe Seq("a b c", "b c d")
    got(1) shouldBe Seq.empty
    got(2) shouldBe Seq.empty
  }

  test("exact-duplicate leak scores ratio 1.0; fresh text 0.0") {
    val corpus = Seq((1L, "the cat sat on the mat today fine")).toDF("id", "text")
    val bench = Seq(
      (10L, "the cat sat on the mat today fine"), // verbatim leak
      (11L, "completely different words appear here now ok yes"))
      .toDF("id", "text")
    val r = Decontam.report(bench, corpus, "id", norm, n = 5)
      .collect().map(x => x.getLong(0) ->
        ((x.getAs[Long]("n_hit"), x.getAs[Double]("contam_ratio"),
          x.getAs[Boolean]("is_contaminated")))).toMap
    r(10L)._2 shouldBe 1.0
    r(10L)._3 shouldBe true
    r(11L) shouldBe ((0L, 0.0, false))
  }

  test("partial overlap counts only shared grams, deduped per doc") {
    val corpus = Seq((1L, "w1 w2 w3 w4 w5 zz")).toDF("id", "text")
    // bench doc repeats the shared phrase twice: distinct grams still
    // count once each
    val bench = Seq((10L, "w1 w2 w3 w4 w5 q w1 w2 w3 w4 w5")).toDF("id", "text")
    val row = Decontam.report(bench, corpus, "id", norm, n = 5).collect().head
    // bench distinct 5-grams: 7 of them; hits: "w1..w5" (1) and "w2..zz"? no
    row.getAs[Long]("n_hit") shouldBe 1L
    row.getAs[Boolean]("is_contaminated") shouldBe true
  }

  test("a doc leaks even when only a phrase (not the whole text) is shared") {
    val corpus = Seq((1L, "prefix junk a b c d e suffix junk here")).toDF("id", "text")
    val bench = Seq((10L, "totally new intro a b c d e new outro")).toDF("id", "text")
    Decontam.report(bench, corpus, "id", norm, 5)
      .select("is_contaminated").as[Boolean].collect() shouldBe Array(true)
  }

  test("docs shorter than n tokens still get a report row (n_grams=0, clean)") {
    val corpus = Seq((1L, "a b c d e f g h")).toDF("id", "text")
    val bench = Seq((10L, "too short"), (11L, "a b c d e f g h")).toDF("id", "text")
    val r = Decontam.report(bench, corpus, "id", norm, 5)
      .collect().map(x => x.getLong(0) ->
        ((x.getAs[Long]("n_grams"), x.getAs[Long]("n_hit"),
          x.getAs[Boolean]("is_contaminated")))).toMap
    r(10L) shouldBe ((0L, 0L, false))
    r(11L)._3 shouldBe true
  }

  test("hashGrams (the scale path) reports identically to string grams") {
    val corpus = Seq((1L, "the cat sat on the mat today fine"),
      (2L, "w1 w2 w3 w4 w5 zz qq")).toDF("id", "text")
    val bench = Seq(
      (10L, "the cat sat on the mat today fine"),
      (11L, "completely different words appear here now ok yes"),
      (12L, "intro w1 w2 w3 w4 w5 outro")).toDF("id", "text")
    assertSameRows(
      Decontam.report(bench, corpus, "id", norm, 5),
      Decontam.report(bench, corpus, "id", norm, 5, hashGrams = true))
  }

  test("larger n suppresses random collisions") {
    val corpus = Seq((1L, "x y z p q r s t")).toDF("id", "text")
    val bench = Seq((10L, "x y unrelated p q other s t")).toDF("id", "text")
    // shares bigrams but no 5-gram
    Decontam.report(bench, corpus, "id", norm, 5)
      .select("n_hit").as[Long].collect() shouldBe Array(0L)
  }
}
