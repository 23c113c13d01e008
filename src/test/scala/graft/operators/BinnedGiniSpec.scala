package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The q47 binned Gini is the fact-cardinality-safe form of q46's
  * exact discrete Gini: the window runs over bins, not rows, at the
  * price of within-bin ordering information. This measures that
  * price on randomized skewed data: sub-0.02 absolute error at the
  * q47 bin width, shrinking with narrower bins.
  */
class BinnedGiniSpec extends SparkSpec {
  import spark.implicits._

  private def exactGini(vals: Seq[Double]): Double = {
    val s = vals.sorted
    val n = s.size.toDouble
    val tot = s.sum
    val weighted = s.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
    2.0 * weighted / (n * tot) - (n + 1.0) / n
  }

  private def binnedGini(vals: Seq[Double], width: Double): Double = {
    val df = vals.toDF("r")
      .select(floor(col("r") / width).cast("long").as("b"), col("r"))
      .groupBy("b").agg(count(lit(1)).as("n"), sum("r").as("s"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("b")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val t = df.agg(sum("n").cast("double").as("tn"), sum("s").as("ts"))
    df.withColumn("cs", sum("s").over(w))
      .crossJoin(broadcast(t))
      .agg(lit(1.0) - sum((col("n") / col("tn"))
        * (lit(2.0) * col("cs") - col("s")) / col("ts")))
      .head.getDouble(0)
  }

  test("binned Gini tracks the exact Gini on randomized skewed data") {
    for (seed <- Seq(7L, 31L)) {
      val rnd = new scala.util.Random(seed)
      // lognormal-ish skew, values in the q47 magnitude range (the
      // lineitem revenue distribution spans ~1k-100k over width-1000
      // bins; a distribution squeezed into a couple of bins is the
      // degenerate case the second test pins)
      val vals = Seq.fill(5000)(math.exp(3.0 + 1.2 * rnd.nextGaussian()) * 300)
      val exact = exactGini(vals)
      val binned = binnedGini(vals, 1000.0)
      withClue(s"seed=$seed exact=$exact binned=$binned: ") {
        assert(math.abs(exact - binned) < 0.02)
        // narrower bins converge toward exact
        val fine = binnedGini(vals, 100.0)
        assert(math.abs(exact - fine) <= math.abs(exact - binned) + 1e-9)
      }
    }
  }

  test("degenerate single-bin input: Gini underestimates to 0, never NaN") {
    val g = binnedGini(Seq.fill(100)(500.0), 1000.0)
    g shouldBe 0.0 +- 1e-12
  }
}
