package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, w: Int, s: Int): Seq[(Int, String, Int)] =
    TextOps.chunkRows(Seq((1L, text)).toDF("doc_id", "text"), "doc_id",
        col("text"), w, s)
      .select("chunk_idx", "chunk_text", "n_tok")
      .as[(Int, String, Int)].collect().sortBy(_._1).toSeq

  test("exact-fit windows: stride offsets, full coverage, no tail chunk") {
    // 10 tokens, w=4, s=3: offsets 0,3,6 — window at 6 ends exactly at 10
    val out = chunks((1 to 10).map(i => s"w$i").mkString(" "), 4, 3)
    out.map(_._1) shouldBe Seq(0, 1, 2)
    out.map(_._3) shouldBe Seq(4, 4, 4)
    out.last._2 shouldBe "w7 w8 w9 w10"
  }

  test("trailing partial window keeps the tail tokens") {
    // 11 tokens: offsets 0,3,6,9 — final window holds the 2 leftovers
    val out = chunks((1 to 11).map(i => s"w$i").mkString(" "), 4, 3)
    out.map(_._3) shouldBe Seq(4, 4, 4, 2)
    out.last._2 shouldBe "w10 w11"
  }

  test("short document yields exactly one whole-document chunk") {
    chunks("a b c", 64, 48) shouldBe Seq((0, "a b c", 3))
  }

  test("every token appears in at least one chunk") {
    val n = 137
    val out = chunks((1 to n).map(i => s"w$i").mkString(" "), 64, 48)
    val covered = out.flatMap(_._2.split(" ")).toSet
    covered shouldBe (1 to n).map(i => s"w$i").toSet
  }

  test("chunking plans without any shuffle") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextOps.chunkRows(df, "doc_id", col("text"), 4, 3)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("stride wider than window is rejected (it would drop tokens)") {
    an[IllegalArgumentException] should be thrownBy
      TextOps.chunkRows(Seq((1L, "a b c")).toDF("doc_id", "text"),
        "doc_id", col("text"), window = 4, stride = 8)
  }

  test("char entropy: uniform text is 0 bits, mixed text matches closed form") {
    val df = Seq((1L, "aaaa"), (2L, "ab ab")).toDF("doc_id", "text")
    val out = TextOps.charStats(df, "doc_id", col("text"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, 0.0, 0.0))
    // "ab ab": chars a:2 b:2 space:1 over n=5 -> log2(5) - 4/5 = 1.5219
    out(1)._2 shouldBe 1.5219
    out(1)._3 shouldBe 0.5 // tokens [ab, ab]: 1 - 1/2
  }
}

class PiiRedactSpec extends SparkSpec {
  import spark.implicits._

  test("each rule redacts its pattern and counts fire on the original text") {
    val text = "mail a.b+c@ex.org node 192.168.0.1 call +44 123-4567 ref 1234567 ok"
    val df = Seq((1L, text)).toDF("id", "t")
    val out = df.select(
        TextFunctions.redactPii(col("t")).as("red"),
        TextFunctions.piiCount(col("t"), "email").as("ne"),
        TextFunctions.piiCount(col("t"), "ip").as("ni"),
        TextFunctions.piiCount(col("t"), "phone").as("np"),
        TextFunctions.piiCount(col("t"), "num").as("nn"))
      .as[(String, Int, Int, Int, Int)].head()
    out._1 shouldBe "mail <EMAIL> node <IP> call <PHONE> ref <NUM> ok"
    (out._2, out._3, out._4, out._5) shouldBe ((1, 1, 1, 1))
  }

  test("clean text passes through unchanged") {
    val df = Seq((1L, "no secrets here at all")).toDF("id", "t")
    df.select(TextFunctions.redactPii(col("t"))).as[String].head() shouldBe
      "no secrets here at all"
  }
}
