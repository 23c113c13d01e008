package graft.sketch

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def estimates(items: Seq[String], probes: Seq[String],
      depth: Int, width: Int): Map[String, Long] = {
    val df = items.toDF("t")
    val sk = CountMin.build(df, col("t"), depth, width)
    CountMin.estimate(sk, probes.toDF("t"), "t", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("property: estimates never undercount, even at adversarial width") {
    val itemGen = Gen.chooseNum(0, 30).map(i => s"w$i")
    checkProp(Gen.listOfN(80, itemGen), cases = 6) { items =>
      val exact = exactCounts(items)
      // width 4 forces heavy collisions; the bound must still hold
      val est = estimates(items, exact.keys.toSeq, depth = 3, width = 4)
      exact.foreach { case (t, n) =>
        withClue(s"term $t: ") { est(t) should be >= n }
      }
    }
  }

  test("wide sketch with few items is exact; absent items estimate 0") {
    val items = Seq("a", "a", "a", "b", "b", "c")
    val est = estimates(items, Seq("a", "b", "c", "nope"), 3, 2048)
    est shouldBe Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "nope" -> 0L)
  }

  test("merge of shard sketches equals the sketch of the union (additive state)") {
    val shardA = (0 until 40).map(i => s"t${i % 7}")
    val shardB = (0 until 25).map(i => s"t${i % 5}")
    val skA = CountMin.build(shardA.toDF("t"), col("t"), 3, 64)
    val skB = CountMin.build(shardB.toDF("t"), col("t"), 3, 64)
    val merged = CountMin.merge(Seq(skA, skB))
    val direct = CountMin.build((shardA ++ shardB).toDF("t"), col("t"), 3, 64)
    assertSameRows(merged, direct)
  }

  test("estimate/merge with mismatched depth/width fail loudly, not with silent 0s") {
    val sk = CountMin.build(Seq("a", "b").toDF("t"), col("t"), 3, 64)
    val probes = Seq("a").toDF("t")
    intercept[IllegalArgumentException] {
      CountMin.estimate(sk, probes, "t", 3, 128)
    }.getMessage should include("width=64")
    intercept[IllegalArgumentException] {
      CountMin.estimate(sk, probes, "t", 4, 64)
    }.getMessage should include("depth=3")
    val other = CountMin.build(Seq("a").toDF("t"), col("t"), 3, 128)
    intercept[IllegalArgumentException] { CountMin.merge(Seq(sk, other)) }
    // the tag survives a parquet round-trip, so persisted sketches
    // stay protected
    val dir = java.nio.file.Files.createTempDirectory("cms").toString
    sk.write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    CountMin.params(reread) shouldBe Some((3, 64))
    intercept[IllegalArgumentException] {
      CountMin.estimate(reread, probes, "t", 3, 128)
    }
  }

  test("null items are ignored, not hashed") {
    val df = Seq(Some("x"), None, Some("x")).toDF("t")
    val sk = CountMin.build(df, col("t"), 3, 64)
    CountMin.estimate(sk, Seq("x").toDF("t"), "t", 3, 64)
      .collect().head.getLong(1) shouldBe 2L
  }
}
