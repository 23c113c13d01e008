package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join: points joined to the intervals containing them —
  * `p.key = i.key AND i.start <= p.v AND p.v < i.end` (end exclusive).
  *
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin (fine
  * only while intervals broadcast) or, with no equi-key, a cross
  * product. This operator BUCKETIZES: intervals explode to every
  * `bucketWidth`-aligned bucket they overlap, points map to exactly
  * one bucket, and the join becomes an EQUI-join on (key, bucket)
  * followed by the exact range filter. Each point lives in one bucket,
  * so no dedup is needed. One hash shuffle, no cross product; the
  * explode factor is ceil(intervalLength / bucketWidth), so pick
  * bucketWidth near the typical interval length.
  *
  * This is the standard spatial/temporal binning trick — the same
  * shape every distributed range-join implementation (interval trees
  * aside) reduces to.
  */
object RangeJoin {

  /** @param points    df with `keys`-cols and a numeric `vCol`
    * @param intervals df with `keys`-cols and numeric `startCol`/`endCol`
    *                  (end exclusive); other columns carried through
    */
  def join(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      vCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bucket", floor(col(vCol) / bucketWidth))
    val i = intervals
      // degenerate intervals (end <= start) match nothing and would
      // otherwise feed sequence() a descending range
      .filter(col(endCol) > col(startCol))
      .withColumn("_bucket",
        explode(sequence(
          floor(col(startCol) / bucketWidth),
          // end is exclusive: an interval ending exactly on a bucket
          // boundary does not reach into that bucket. ceil(end/w)-1
          // equals floor((end-1)/w) for integer endpoints and stays
          // correct for fractional ones (e.g. [10.0, 10.5) with w=1
          // must still cover bucket 10).
          ceil(col(endCol) / bucketWidth) - 1)))
    p.join(i, keys :+ "_bucket")
      .filter(col(startCol) <= col(vCol) && col(vCol) < col(endCol))
      .drop("_bucket")
  }
}
