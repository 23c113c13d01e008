package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-scaled histogram sketch for quantiles — the HDR-histogram idea
  * as a mergeable table: positive values bucket into `sub` linear
  * sub-buckets per power of two (`bucket = 16·floor(log2 v) +
  * floor((v/2^e − 1)·16)`), so bucket width is ≤ 1/16 of the value it
  * covers and any quantile read from bucket edges carries at most
  * ~6.25 % relative error — at EVERY magnitude, which a fixed-width
  * histogram cannot do. State is one counter row per non-empty bucket
  * (≤ sub·log2(max/min) rows total, independent of row count), and
  * shard merge is union + sum — counter state, the CountMin
  * discipline applied to quantiles. Unlike t-digest/KLL there is no
  * merge-order dependence at all: bucket boundaries are fixed by
  * arithmetic, so the sketch is bit-deterministic across engines,
  * partitionings, and replays (floor/log2/divide on IEEE doubles are
  * reproduced verbatim by the oracle).
  *
  * Defined on POSITIVE values (log scale); shift or split by sign
  * upstream. Zero/negative/null rows are excluded and counted by the
  * caller's own NotNull/InRange checks.
  */
object LogHistogram {

  val Sub = 16

  /** Bucket id of a positive value. */
  def bucketOf(v: Column): Column = {
    val e = floor(log2(v))
    (e * Sub + floor((v / pow(lit(2.0), e) - 1) * Sub)).cast("long")
  }

  /** Lower edge of a bucket — the deterministic quantile estimate.
    * The exponent unpacks with FLOOR division (`div` truncates toward
    * zero, which mis-unpacks the negative exponents of values < 1:
    * bucket −46 is e = −3, sub = 2, not e = −2).
    */
  def lowerEdge(bucket: Column): Column =
    (lit(1.0) + pmod(bucket, lit(Sub.toLong)).cast("double") / Sub) *
      pow(lit(2.0), expr(s"(bucket - pmod(bucket, $Sub)) div $Sub"))

  /** (bucket, cnt) over the positive values of `valueCol`. */
  def build(df: DataFrame, valueCol: Column): DataFrame =
    df.filter(valueCol.isNotNull && valueCol > 0)
      .select(bucketOf(valueCol).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Shard merge: counters add. */
  def merge(hists: Seq[DataFrame]): DataFrame = {
    require(hists.nonEmpty, "need at least one histogram")
    hists.reduce(_ unionByName _).groupBy("bucket").agg(sum("cnt").as("cnt"))
  }

  /** Quantile estimates: for each q, the lower edge of the first
    * bucket whose cumulative count reaches q·N. The cumulative walk
    * runs on the HISTOGRAM (≤ a few hundred rows — the one place a
    * single-partition ordered window is exactly right), never the
    * data.
    */
  def quantiles(hist: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must be in (0, 1]")
    val cumW = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    val totW = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val walked = hist
      .withColumn("cum", sum("cnt").over(cumW))
      .withColumn("total", sum("cnt").over(totW))
    val spark = hist.sparkSession
    val qdf = spark.createDataFrame(qs.map(Tuple1.apply)).toDF("q")
    broadcast(qdf).join(walked, col("cum") >= col("q") * col("total"))
      .groupBy("q").agg(min("bucket").as("bucket"))
      .select(col("q"), lowerEdge(col("bucket")).as("est"))
  }
}
