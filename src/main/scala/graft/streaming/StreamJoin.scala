package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the correlation step
  * (impressions x clicks, request x response, sensor x actuation) the
  * reference's single-table sync never needed but any event pipeline
  * at scale does.
  *
  * Semantics: rows join when their keys match AND the left event time
  * falls in [right ts, right ts + maxDelay]. Both sides carry the
  * same watermark delay, which gives Spark the two bounds it needs to
  * garbage-collect join state: a right row can be dropped once the
  * left watermark passes rightTs + maxDelay, a left row once the
  * right watermark passes leftTs. Without BOTH the time-range
  * condition and the watermarks the state store grows without bound —
  * that is the 100 TB failure mode this wrapper exists to make
  * unrepresentable.
  *
  * Execution: StreamingSymmetricHashJoinExec, state keyed by the join
  * keys — the shuffle partitioning is the key hash, identical to a
  * batch shuffle join, so skew tooling (salting) applies unchanged.
  */
object StreamJoin {

  /** @param maxDelay SQL interval literal body, e.g. "10 seconds" */
  def interval(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      keys: Seq[String],
      watermarkDelay: String,
      maxDelay: String,
      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one equality key")
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val rangeCond =
      col(s"l.$leftTs") >= col(s"r.$rightTs") &&
        col(s"l.$leftTs") <= col(s"r.$rightTs") + expr(s"INTERVAL $maxDelay")
    l.join(r, keyCond && rangeCond, joinType)
  }
}
