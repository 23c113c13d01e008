package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-provided parquet tables
  * (`/root/testdata/sf*`; see TESTDATA.md). At cluster scale the same
  * interface fronts a catalog table or connector-backed source — the
  * engine's operators only see DataFrames.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` with normalized time columns. The driver writes `ts` as
    * parquet TIMESTAMP(NANOS) which vanilla Spark refuses to read
    * ([PARQUET_TYPE_ILLEGAL]); with `legacy.parquet.nanosAsLong` it
    * arrives as epoch-nanos LongType. We derive:
    *   - `version` — epoch millis (the reference's `unix_time_millis`
    *     versioning, reference utils.py:68-74), floor division so it
    *     matches DuckDB's `epoch_ms` on the µs-truncated timestamp;
    *   - `ts` — µs-truncated TimestampType (what DuckDB's reader also
    *     yields), so downstream date functions agree across engines.
    * Integer `div`, never `/`: epoch-nanos ≈ 1.7e18 exceeds a double's
    * 2^53 exact-integer range, so float division would corrupt versions.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("version", expr("ts div 1000000"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
