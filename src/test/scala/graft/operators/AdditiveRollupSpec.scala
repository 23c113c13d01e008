package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class AdditiveRollupSpec extends SparkSpec {
  import spark.implicits._

  private def oneShot(df: org.apache.spark.sql.DataFrame) =
    df.groupBy((col("g") % 10).as("grain"), col("k"))
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"))
      .withColumn("avg_v", col("sum_v") / col("n"))

  test("property: partial-merge rollup equals the one-shot aggregate") {
    val rowGen = Gen.zip(Gen.chooseNum(0L, 99L), Gen.oneOf("a", "b", "c"),
      Gen.chooseNum(-50, 150).map(_ / 4.0))
    checkProp(Gen.listOfN(60, rowGen), cases = 6) { rows =>
      val df = rows.toDF("g", "k", "v")
      // fine grain = g itself, coarse grain = g % 10
      val partials = AdditiveRollup.partials(df, col("g"), Seq("k"), col("v"))
      val rolled = AdditiveRollup.rollup(partials,
        col("_grain") % 10, Seq("k"))
      assertSameRows(rolled, oneShot(df))
    }
  }

  test("incremental maintenance: overwriting one grain's partial updates the rollup") {
    val day1 = Seq((1L, "a", 2.0), (1L, "a", 4.0), (2L, "a", 10.0)).toDF("g", "k", "v")
    val p1 = AdditiveRollup.partials(day1, col("g"), Seq("k"), col("v"))
    // tick: grain 2 re-arrives with different facts — replace ONLY its row
    val day2 = Seq((2L, "a", 100.0), (2L, "a", 200.0)).toDF("g", "k", "v")
    val p2 = AdditiveRollup.partials(day2, col("g"), Seq("k"), col("v"))
    val merged = p1.filter(col("_grain") =!= 2L).unionByName(p2)
    val rolled = AdditiveRollup.rollup(merged, lit(0), Seq("k"))
    val expected = day1.filter(col("g") =!= 2L).unionByName(day2)
    assertSameRows(rolled, oneShot(expected.withColumn("g", lit(0L))))
  }

  test("grains never co-mingle: distinct coarse buckets stay separate") {
    val df = Seq((1L, "a", 1.0), (11L, "a", 5.0)).toDF("g", "k", "v")
    val rolled = AdditiveRollup.rollup(
      AdditiveRollup.partials(df, col("g"), Seq("k"), col("v")),
      col("_grain") % 10, Seq("k"))
    rolled.count() shouldBe 1 // both land in coarse bucket 1
    rolled.select("n").as[Long].head() shouldBe 2L
  }
}
