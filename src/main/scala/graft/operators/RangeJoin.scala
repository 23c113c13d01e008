package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

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

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** floor(value / w) computed entirely in integer space: exact at ANY
    * magnitude (`pmod` keeps the remainder non-negative, so this is
    * true floor division for negatives too). The double-division form
    * silently loses low bits past 2^53 — epoch-nanos territory — where
    * a shrunk interval bucket and an exact point bucket stop meeting.
    */
  private def floorDivSql(valueSql: String, w: Long): String =
    s"((($valueSql) - pmod(($valueSql), ${w}L)) div ${w}L)"

  /** Bucket of a single value: integer-exact when the column is an
    * integral type; double floor otherwise. Fractional columns keep
    * the documented magnitude bound |value| < 2^53 (beyond it the
    * values themselves are already quantized coarser than 1).
    */
  private def bucketOf(dt: DataType, c: String, w: Long): Column =
    if (isIntegral(dt)) expr(floorDivSql(s"`$c`", w))
    else floor(col(c) / w)

  /** Last bucket a half-open interval reaches: floor((end-1)/w) in
    * exact integer space for integral ends; ceil(end/w)-1 for
    * fractional ones (an interval ending exactly on a bucket boundary
    * does not reach into that bucket; [10.0, 10.5) with w=1 must
    * still cover bucket 10).
    */
  private def lastBucketOf(dt: DataType, e: String, w: Long): Column =
    if (isIntegral(dt)) expr(floorDivSql(s"`$e` - 1", w))
    else ceil(col(e) / w) - 1

  /** @param points    df with `keys`-cols and a numeric `vCol`
    * @param intervals df with `keys`-cols and numeric `startCol`/`endCol`
    *                  (end exclusive); other columns carried through
    */
  def join(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      vCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bucket",
      bucketOf(points.schema(vCol).dataType, vCol, bucketWidth))
    val i = intervals
      // degenerate intervals (end <= start) match nothing and would
      // otherwise feed sequence() a descending range
      .filter(col(endCol) > col(startCol))
      .withColumn("_bucket",
        explode(sequence(
          bucketOf(intervals.schema(startCol).dataType, startCol, bucketWidth),
          lastBucketOf(intervals.schema(endCol).dataType, endCol, bucketWidth))))
    p.join(i, keys :+ "_bucket")
      .filter(col(startCol) <= col(vCol) && col(vCol) < col(endCol))
      .drop("_bucket")
  }

  /** Interval-overlap join: pairs (a, b) with matching keys whose
    * half-open intervals intersect — `a.start < b.end AND b.start <
    * a.end`. Same bucketization as `join`, with both sides exploded;
    * each overlapping pair would then meet in EVERY bucket both cover,
    * so the match is pinned to one canonical bucket — the one holding
    * the overlap's start, `floor(max(a.start, b.start) / width)`,
    * which both intervals necessarily cover. One equi-shuffle on
    * (keys, bucket), no cross product, no post-hoc distinct (dedup by
    * construction keeps the aggregate-free pipeline streamable).
    *
    * Column names across the two inputs must be disjoint apart from
    * the key columns (rename upstream as needed).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def explodeBuckets(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("_bucket",
        explode(sequence(
          bucketOf(df.schema(s).dataType, s, bucketWidth),
          lastBucketOf(df.schema(e).dataType, e, bucketWidth))))
    val l = explodeBuckets(left, lStart, lEnd)
    val r = explodeBuckets(right, rStart, rEnd)
    // the canonical-bucket pin must use the same arithmetic as the
    // explode above or a pair straddling 2^53 would pin to a bucket
    // neither side exploded to
    val bothIntegral = isIntegral(left.schema(lStart).dataType) &&
      isIntegral(right.schema(rStart).dataType)
    val pin =
      if (bothIntegral)
        expr(floorDivSql(s"greatest(`$lStart`, `$rStart`)", bucketWidth))
      else floor(greatest(col(lStart), col(rStart)) / bucketWidth)
    l.join(r, keys :+ "_bucket")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("_bucket") === pin)
      .drop("_bucket")
  }
}
