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

  /** `events` with normalized time columns, adaptive to the generator's
    * `ts` physical type (it has shipped both TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) across driver versions).
    * Normalized output, identical either way:
    *   - `version` — epoch millis (the reference's `unix_time_millis`
    *     versioning, reference utils.py:68-74), matching DuckDB's
    *     `epoch_ms(ts)` on the same file;
    *   - `ts` — µs-precision TimestampType (what DuckDB's reader also
    *     yields), so downstream date functions agree across engines.
    * Nanos arrive as LongType via `legacy.parquet.nanosAsLong`; integer
    * `div`, never `/`: epoch-nanos ≈ 1.7e18 exceeds a double's 2^53
    * exact-integer range, so float division would corrupt versions.
    * Micros arrive as TIMESTAMP_NTZ; the cast to TimestampType reads
    * the wall-clock as session-local, so the engine-wide UTC session
    * convention (every entry point sets spark.sql.session.timeZone=UTC)
    * is what keeps `unix_millis` equal to DuckDB's naive-UTC epoch_ms.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEvents(load(spark, sfDir, "events"))
  }

  /** The type-adaptive normalization of [[loadEvents]] over an
    * already-read frame — for callers (the incremental-artifact piece
    * builders) that receive raw event file subsets instead of reading
    * the table themselves. Readers on a possibly-nanos file must set
    * `spark.sql.legacy.parquet.nanosAsLong` BEFORE the read, as
    * [[loadEvents]] does.
    */
  def normalizeEvents(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("version", expr("ts div 1000000"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("version", expr("unix_millis(ts)"))
    }
}
