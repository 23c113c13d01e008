package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def mergeTuples(ms: Seq[Bpe.Merge]) =
    ms.map(m => (m.rank, m.s1, m.s2, m.count))

  test("the Sennrich walkthrough: (a,b) then (ab,c), early stop when pairs run out") {
    // types: ab x3, abc x2 -> pair (a,b) weight 5 beats (b,c) weight 2;
    // after merging, only (ab,c) weight 2 remains; then nothing.
    val df = Seq("ab ab abc", "ab abc").toDF("text")
    val got = Bpe.train(df, col("text"), k = 5, cap = 100)
    mergeTuples(got) shouldBe Seq((1, "a", "b", 5L), (2, "ab", "c", 2L))
  }

  test("count ties break to the lexicographically smaller pair") {
    // xy and pq both weight 1; "p q" < "x y"
    val df = Seq("xy pq").toDF("text")
    val got = Bpe.train(df, col("text"), k = 1, cap = 100)
    mergeTuples(got) shouldBe Seq((1, "p", "q", 1L))
  }

  test("adjacent repeated pairs: ' a a a ' merges leftmost only (aa, a)") {
    val df = Seq("aaa aaa").toDF("text")
    // pair (a,a) weight 4 (overlapping enumeration, 2 per occurrence)
    val m1 = Bpe.train(df, col("text"), k = 1, cap = 100)
    mergeTuples(m1) shouldBe Seq((1, "a", "a", 4L))
    val pieces = Seq("aaa").toDF("w")
      .select(split(trim(Bpe.encodeSeg(col("w"), m1)), " ").as("p"))
      .head().getSeq[String](0)
    pieces shouldBe Seq("aa", "a")
  }

  test("encoding is lossless: pieces always concatenate back to the word") {
    val df = Seq("the quick brown fox jumps over the lazy dog the the quick")
      .toDF("text")
    val ms = Bpe.train(df, col("text"), k = 6, cap = 100)
    val words = Seq("the", "quick", "unseenword", "a", "thequickest")
    val back = words.toDF("w")
      .select(col("w"),
        regexp_replace(trim(Bpe.encodeSeg(col("w"), ms)), " ", "").as("j"))
      .collect()
    back.foreach(r => r.getString(1) shouldBe r.getString(0))
  }

  test("piece counts never increase as more merges apply") {
    val df = Seq("alpha beta alpha gamma beta alpha").toDF("text")
    val ms = Bpe.train(df, col("text"), k = 6, cap = 100)
    val w = Seq("alpha", "beta", "gamma", "delta").toDF("w")
    (0 to ms.length).sliding(2).foreach {
      case Seq(i, j) =>
        val ci = w.select(Bpe.pieceCount(col("w"), ms.take(i))).as[Int].collect()
        val cj = w.select(Bpe.pieceCount(col("w"), ms.take(j))).as[Int].collect()
        ci.zip(cj).foreach { case (a, b) => b should be <= a }
      case _ =>
    }
  }

  test("train is deterministic and the store round-trip is bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_store").toString
    val docs = (0 until 40).map(i =>
      (i.toLong, s"row value table w$i row value scan table row"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val inline = Bpe.train(
      spark.read.parquet(s"$dir/documents.parquet"), col("text"), 8, 4096)
    val stored = TokenizerStore.merges(spark, dir, "documents", "text", 8, 4096)
    stored shouldBe inline
    // second read hits the per-process memo (no new entry)
    val before = TokenizerStore.memoSize
    TokenizerStore.merges(spark, dir, "documents", "text", 8, 4096)
    TokenizerStore.memoSize shouldBe before
  }

  test("encodeStats is one zero-shuffle projection per document") {
    val df = Seq((1L, "ab ab abc"), (2L, "ab")).toDF("doc_id", "text")
    val ms = Bpe.train(df, col("text"), k = 2, cap = 100)
    val stats = Bpe.encodeStats(df, "doc_id", col("text"), ms)
    // both merges land: ab -> 1 piece and abc -> 1 piece (ab+c)
    val got = stats.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got(1L) shouldBe ((3L, 3L))
    got(2L) shouldBe ((1L, 1L))
    assert(!stats.queryExecution.executedPlan.toString.contains("Exchange"),
      "tokenizer application must not shuffle")
  }
}
