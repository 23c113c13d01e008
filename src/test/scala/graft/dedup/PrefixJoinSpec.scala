package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(df: org.apache.spark.sql.DataFrame,
      tauNum: Int, tauDen: Int) = {
    val sets = df.select(col("doc_id"),
      array_distinct(split(graft.functions.TextFunctions.normalize(col("text")),
        " ")).as("toks"))
    val a = sets.select(col("doc_id").as("id_a"), col("toks").as("ta"))
    val b = sets.select(col("doc_id").as("id_b"), col("toks").as("tb"))
    val sz = org.apache.spark.sql.functions.size _
    val inter = sz(array_intersect(col("ta"), col("tb")))
    val union = sz(col("ta")) + sz(col("tb")) - inter
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .where(inter * tauDen >= union * tauNum)
      .select(col("id_a"), col("id_b"),
        round(inter.cast("double") / union, 4).as("jaccard"))
  }

  test("prefix filter loses no pair vs brute force (exactness theorem)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "entirely different text with no overlap at all"),
      (5L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (6L, "quick brown fox jumps over lazy dog"),
      (7L, "a b c d e f g h i j"),
      (8L, "a b c d e f g h i k"),
      (9L, ""),
      (10L, "   ")).toDF("doc_id", "text")
    for ((n, d) <- Seq((1, 2), (9, 10), (8, 10), (7, 10), (1, 1))) {
      val got = PrefixJoin.similarPairs(docs, "doc_id", col("text"), n, d)
      assertSameRows(got, bruteForce(docs, n, d))
    }
  }

  test("randomized corpora: exact under every threshold shape") {
    val vocab = ('a' to 'p').map(_.toString)
    val gen = org.scalacheck.Gen.listOfN(30,
      org.scalacheck.Gen.listOfN(12, org.scalacheck.Gen.oneOf(vocab)))
    checkProp(gen, cases = 5) { texts =>
      val docs = texts.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = PrefixJoin.similarPairs(docs, "doc_id", col("text"), 7, 10)
      assertSameRows(got, bruteForce(docs, 7, 10))
    }
  }

  test("clusters: transitive closure of the exact pair graph, min-id labels") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"), // ~1
      (3L, "a b c d e f g h k l"), // ~2, not ~1 (chain joins all three)
      (4L, "totally different things here now then"),
      (5L, "a b c d e f g h i j"), // exact dup of 1
      (6L, "x y z w v u t s r q")).toDF("doc_id", "text")
    val got = PrefixJoin.clusters(docs, "doc_id", col("text"), 7, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    got(1L) shouldBe 1L
    got(2L) shouldBe 1L
    got(3L) shouldBe 1L // reached through 2 even though J(1,3) < 0.7
    got(5L) shouldBe 1L
    got(4L) shouldBe 4L
    got(6L) shouldBe 6L
    got.size shouldBe 6
  }

  test("integer threshold arithmetic: boundary pair neither lost nor invented") {
    // |a|=9, |b|=10, inter=9 => J = 9/10 exactly: must be IN at tau=9/10
    val docs = Seq(
      (1L, "a b c d e f g h i"),
      (2L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val in = PrefixJoin.similarPairs(docs, "doc_id", col("text"), 9, 10)
    in.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) shouldBe
      Array((1L, 2L, 0.9))
    // at tau just above 9/10 the pair must be OUT
    val out = PrefixJoin.similarPairs(docs, "doc_id", col("text"), 91, 100)
    out.count() shouldBe 0L
  }
}
