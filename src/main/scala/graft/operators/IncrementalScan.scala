package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Watermark

/** Incremental windowed scan — SURVEY.md §2.1 S1/S2/S3 unified.
  *
  * The reference builds `WHERE v > last AND v <= this ALLOW FILTERING`
  * CQL (pyCassElastic.py:205-212) and an ES `constant_score` range
  * filter (pyCassElastic.py:367-384). We declare the same half-open
  * window as a Catalyst predicate and let pushdown carry it to the
  * source: against parquet it prunes row groups via min/max stats;
  * against a DSv2 connector it rides SupportsPushDownFilters. The
  * reference's two sides disagree (CQL half-open vs ES closed
  * [gte, lte]) — per SURVEY.md §2.2 P4 we standardize on (last, this].
  *
  * Scale note: the predicate alone makes the scan O(window), but only
  * if the layout supports pruning — the reference's own TODO
  * (README.md:21,77) wants time-partitioned storage. `TableIO.write`
  * partitions snapshots by a date column for exactly this reason.
  */
object IncrementalScan {

  /** Rows with versionCol in (span.lastMs, span.thisMs]; projection
    * optional (reference `fields_list`, pyCassElastic.py:199-202).
    *
    * `dayCol`: when the table is laid out day-partitioned
    * (`ParquetTableIO.dayPartitioned`), the version predicate alone
    * cannot prune — Catalyst sees no relation between a LongType
    * version and a DateType partition value. Passing the partition
    * column here adds the equivalent day-range predicate
    * `day(last) <= dayCol <= day(this)` (both bounds fold to literals),
    * which the scan turns into PartitionFilters: only the window's
    * days are listed and read. The exact row-level version filter
    * still applies on top.
    */
  def apply(
      df: DataFrame,
      versionCol: String,
      span: Watermark.Span,
      projection: Seq[String] = Nil,
      dayCol: Option[String] = None): DataFrame = {
    val pruned = dayCol match {
      case Some(d) => df.filter(
        col(d) >= to_date(timestamp_millis(lit(span.lastMs))) &&
          col(d) <= to_date(timestamp_millis(lit(span.thisMs))))
      case None => df
    }
    val filtered = pruned.filter(
      col(versionCol) > lit(span.lastMs) && col(versionCol) <= lit(span.thisMs))
    if (projection.isEmpty) filtered
    else filtered.select(projection.map(col): _*)
  }
}
