package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.operators.LwwMerge

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the per-domain registries; each carries
  * its own DuckDB oracle where SQL-expressible.
  */
object SparkEntry {

  def registry: Seq[GraftQuery] =
    SyncQueries.all ++ RelationalQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The engine's minimum slice (SURVEY.md §7.3): deduplicated
    * latest state of everything in the events table, LWW by version.
    */
  def entry(spark: SparkSession): DataFrame = {
    val ev = Tables.loadEvents(spark, "/root/testdata/sf0.001")
    LwwMerge.latestAgg(ev, Seq("user_id"), "version", Seq(col("event_id")))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
