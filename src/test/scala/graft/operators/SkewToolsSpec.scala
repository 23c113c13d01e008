package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewToolsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 500).map { i =>
    // hot key: "a" owns 80% of rows
    (if (i % 5 == 0) s"k${i % 7}" else "a", i.toLong % 37, i.toLong)
  }.toDF("k", "u", "v")

  test("salted two-phase agg equals the plain aggregation exactly") {
    val salted = SkewTools.saltedAgg(df, Seq("k"), col("u"), 16,
      partial = Seq(count(lit(1)).as("_pc"), count_distinct(col("u")).as("_pu"),
        sum(col("v")).as("_ps"), max(col("v")).as("_pm")),
      merge = Seq(sum(col("_pc")).as("n"), sum(col("_pu")).as("nu"),
        sum(col("_ps")).as("s"), max(col("_pm")).as("m")))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"),
      count_distinct(col("u")).as("nu"), sum(col("v")).as("s"), max(col("v")).as("m"))
    assertSameRows(salted, plain)
  }

  test("salt=1 degenerates to the plain plan's results") {
    val salted = SkewTools.saltedAgg(df, Seq("k"), col("u"), 1,
      partial = Seq(count(lit(1)).as("_pc")), merge = Seq(sum(col("_pc")).as("n")))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"))
    assertSameRows(salted, plain)
  }

  test("deterministic: two executions produce identical results") {
    def run() = SkewTools.saltedAgg(df, Seq("k"), col("u"), 8,
      partial = Seq(count(lit(1)).as("_pc")), merge = Seq(sum(col("_pc")).as("n")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    run() shouldBe run()
  }
}
