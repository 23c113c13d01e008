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

  test("packPlan: offsets are the exclusive cumsum in id order; pack math exact") {
    val docs = Seq(
      (0L, "a b c"),          // 3 toks, start 0
      (1L, "d e f g"),        // 4 toks, start 3
      (2L, "h i j k l m n o p q"), // 10 toks, start 7 -> spans packs 0..2
      (3L, "r"))              // 1 tok, start 17
      .toDF("doc_id", "text")
    val got = TextOps.packPlan(docs, "doc_id", col("text"),
        budget = 8L, bucketSize = 2L)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tok"), r.getAs[Long]("start_off"),
        r.getAs[Long]("pack_first"), r.getAs[Long]("pack_last"),
        r.getAs[Long]("pack_offset"), r.getAs[Long]("n_packs")))
    got shouldBe Array(
      (0L, 3L, 0L, 0L, 0L, 0L, 1L),
      (1L, 4L, 3L, 0L, 0L, 3L, 1L),
      (2L, 10L, 7L, 0L, 2L, 7L, 3L),
      (3L, 1L, 17L, 2L, 2L, 1L, 1L))
  }

  test("packPlan: result invariant to bucketSize (pure scale knob)") {
    val docs = (0 until 40).map(i => (i.toLong, ("w " * (i % 7 + 1)).trim))
      .toDF("doc_id", "text")
    def run(b: Long) = TextOps.packPlan(docs, "doc_id", col("text"), 16L, b)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val base = run(4096L)
    Seq(1L, 3L, 7L).foreach(b => withClue(s"bucketSize=$b: ")(run(b) shouldBe base))
  }

  test("repetitionStats: looped text scores high, distinct text zero, short docs report") {
    val docs = Seq(
      (1L, "x y x y x y x y"),   // 2-grams: 7 total, dup-heavy
      (2L, "a b c d e f"),       // all n-grams distinct
      (3L, "z"))                 // shorter than every n
      .toDF("doc_id", "text")
    val got = TextOps.repetitionStats(docs, "doc_id", col("text"), Seq(2, 3))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getAs[Long]("n_grams"), r.getAs[Double]("dup_ratio")))).toMap
    // doc 1: 7 bigrams, only 2 distinct ("x y", "y x") -> 1 - 2/7
    got((1L, 2)) shouldBe ((7L, 0.7143))
    // doc 1 trigrams: 6 total, 2 distinct
    got((1L, 3)) shouldBe ((6L, 0.6667))
    got((2L, 2)) shouldBe ((5L, 0.0))
    got((2L, 3)) shouldBe ((4L, 0.0))
    // short doc: one truncated gram per n, never dropped
    got((3L, 2)) shouldBe ((1L, 0.0))
    got((3L, 3)) shouldBe ((1L, 0.0))
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

  test("unigramLogProb: common-word docs outscore rare-word docs, closed form") {
    // corpus: 'the' x6, 'rare' x1, 'odd' x1 => total 8
    val df = Seq(
      (1L, "the the the"), // 3 tokens of p=6/8
      (2L, "the the the"),
      (3L, "rare odd")) // p=1/8 each
      .toDF("doc_id", "text")
    val got = TextOps.unigramLogProb(df, "doc_id", col("text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got(1L) shouldBe ((3L, math.floor(math.log(6.0 / 8) * 1e4 + 0.5) / 1e4))
    got(3L)._1 shouldBe 2L
    got(3L)._2 shouldBe (math.floor(math.log(1.0 / 8) * 1e4 + 0.5) / 1e4 +- 1e-9)
    got(1L)._2 should be > got(3L)._2 // common beats rare
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
