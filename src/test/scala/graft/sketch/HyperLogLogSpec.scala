package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HyperLogLogSpec extends SparkSpec {
  import spark.implicits._

  private def estimateOf(items: Seq[String]): Double = {
    val sk = HyperLogLog.build(items.toDF("t"), col("t"))
    HyperLogLog.estimate(sk).collect().head.getDouble(0)
  }

  test("estimates track true cardinality within the m=64 error envelope") {
    // standard error is 1.04/sqrt(64) ~ 13%; assert a generous 3-sigma
    Seq(100, 1000, 5000).foreach { n =>
      val est = estimateOf((0 until n).map(i => s"item$i"))
      withClue(s"n=$n est=$est: ") {
        est should be > n * 0.6
        est should be < n * 1.4
      }
    }
  }

  test("duplicates never move the estimate (distinctness, not volume)") {
    val once = estimateOf((0 until 500).map(i => s"x$i"))
    val tenTimes = estimateOf(
      Seq.fill(10)((0 until 500).map(i => s"x$i")).flatten)
    tenTimes shouldBe once
  }

  test("shard merge by register max equals the one-shot sketch") {
    val a = (0 until 800).map(i => s"a$i")
    val b = (400 until 1200).map(i => s"a$i") // overlapping shards
    val skA = HyperLogLog.build(a.toDF("t"), col("t"))
    val skB = HyperLogLog.build(b.toDF("t"), col("t"))
    val merged = HyperLogLog.merge(Seq(skA, skB))
    val direct = HyperLogLog.build((a ++ b).toDF("t"), col("t"))
    assertSameRows(merged, direct)
  }

  test("small cardinalities use linear counting and land near-exact") {
    val est = estimateOf((0 until 20).map(i => s"s$i"))
    est should be > 15.0
    est should be < 25.0
  }

  test("keyed sketches estimate per group; state stays <= m rows per group") {
    val df = (0 until 2000).map(i => (s"g${i % 3}", s"t${i % 97}")).toDF("g", "t")
    val sk = HyperLogLog.build(df, col("t"), keys = Seq("g"))
    sk.groupBy("g").count().select(max("count")).head().getLong(0) should be <= 64L
    val est = HyperLogLog.estimate(sk, keys = Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    est.keySet shouldBe Set("g0", "g1", "g2")
    // each group saw ~97 distinct items
    est.values.foreach { e => e should be > 60.0; e should be < 140.0 }
  }
}
