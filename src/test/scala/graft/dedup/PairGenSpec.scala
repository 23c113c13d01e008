package graft.dedup

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class PairGenSpec extends SparkSpec {
  import spark.implicits._

  test("emits each unordered in-bucket pair exactly once, a < b") {
    val df = Seq((1L, 10L), (1L, 30L), (1L, 20L), (2L, 5L), (2L, 6L), (3L, 9L))
      .toDF("bucket", "id")
    val got = PairGen.pairsWithin(df, Seq("bucket"), col("id"))
      .as[(Long, Long)].collect().toSeq
    got.length shouldBe got.toSet.size // no duplicates
    got.toSet shouldBe Set((10L, 20L), (10L, 30L), (20L, 30L), (5L, 6L))
    all(got.map { case (a, b) => a < b }) shouldBe true
  }

  test("property: equals the self-join formulation") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 15L)))
    checkProp(gen, cases = 10) { rows =>
      val df = rows.distinct.toDF("bucket", "id")
      val got = PairGen.pairsWithin(df, Seq("bucket"), col("id"))
        .as[(Long, Long)].collect().toSet
      val expected = (for {
        (b1, i1) <- rows.distinct; (b2, i2) <- rows.distinct
        if b1 == b2 && i1 < i2
      } yield (i1, i2)).toSet
      got shouldBe expected
    }
  }

  test("maxBucket truncates deterministically: smallest members kept") {
    val df = (1L to 10L).map(i => (1L, i)).toDF("bucket", "id")
    val got = PairGen.pairsWithin(df, Seq("bucket"), col("id"), maxBucket = 4)
      .as[(Long, Long)].collect().toSet
    // sorted members 1..4 kept -> C(4,2) pairs
    got shouldBe Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
  }

  test("property: pairsWithinDistinct on duplicated input equals " +
      "pairsWithin on the pre-distincted input") {
    val gen = Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 9L)))
    checkProp(gen, cases = 10) { rows =>
      val df = rows.toDF("bucket", "id") // duplicates kept
      val fused = PairGen.pairsWithinDistinct(df, Seq("bucket"), col("id"))
        .as[(Long, Long)].collect()
      val twoPass = PairGen.pairsWithin(rows.distinct.toDF("bucket", "id"),
        Seq("bucket"), col("id")).as[(Long, Long)].collect()
      fused.sorted.toSeq shouldBe twoPass.sorted.toSeq // multiset equality
    }
  }

  test("pairsWithinDistinct maxBucket keeps the smallest DISTINCT members") {
    val df = ((1L to 6L) ++ (1L to 6L)).map(i => (1L, i)).toDF("bucket", "id")
    val got = PairGen.pairsWithinDistinct(df, Seq("bucket"), col("id"),
      maxBucket = 3).as[(Long, Long)].collect().toSet
    got shouldBe Set((1L, 2L), (1L, 3L), (2L, 3L))
  }
}
