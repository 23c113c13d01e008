package graft.sketch

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class LogHistogramSpec extends SparkSpec {
  import spark.implicits._

  private def estMap(values: Seq[Double], qs: Seq[Double]): Map[Double, Double] = {
    val hist = LogHistogram.build(values.toDF("v"), col("v"))
    LogHistogram.quantiles(hist, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
  }

  test("property: every quantile estimate is within the bucket's relative-error bound") {
    val vGen = Gen.chooseNum(1, 1000000).map(_.toDouble / 7.0)
    checkProp(Gen.listOfN(120, vGen), cases = 6) { values =>
      val qs = Seq(0.25, 0.5, 0.9, 0.99)
      val est = estMap(values, qs)
      val sorted = values.sorted
      qs.foreach { q =>
        // the true q-th value lies in or above the chosen bucket: the
        // lower-edge estimate may undershoot by at most one bucket
        // width (1/16 of the edge) and never overshoots the value's
        // own bucket's upper edge
        val trueV = sorted(math.ceil(q * values.size).toInt - 1)
        withClue(s"q=$q est=${est(q)} true=$trueV: ") {
          est(q) should be <= trueV
          est(q) * (1.0 + 2.0 / LogHistogram.Sub) should be >= trueV * (1.0 - 1e-9)
        }
      }
    }
  }

  test("shard merge equals the one-shot histogram (counter state)") {
    val a = (1 to 300).map(_ * 3.7)
    val b = (1 to 200).map(_ * 11.1)
    val hA = LogHistogram.build(a.toDF("v"), col("v"))
    val hB = LogHistogram.build(b.toDF("v"), col("v"))
    assertSameRows(LogHistogram.merge(Seq(hA, hB)),
      LogHistogram.build((a ++ b).toDF("v"), col("v")))
  }

  test("non-positive and null values are excluded by contract") {
    val hist = LogHistogram.build(
      Seq(Some(4.0), Some(-1.0), Some(0.0), None).toDF("v"), col("v"))
    hist.agg(sum("cnt")).head.getLong(0) shouldBe 1L
  }

  test("identical values land in one bucket; any quantile returns its edge") {
    val est = estMap(Seq.fill(50)(100.0), Seq(0.01, 0.5, 1.0))
    est.values.toSet.size shouldBe 1
    // 100 = 1.5625 * 2^6 -> bucket edge (1 + 9/16) * 64 = 100 exactly
    est(0.5) shouldBe 100.0
  }
}
