package graft.sketch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.Piece

/** Persisted TIME-PARTITIONED sketch state over the event stream —
  * the promise in HyperLogLog's doc ("yesterday's registers never
  * rescan yesterday's corpus") made real: per-day HLL registers of
  * the active-user set are maintained as an additive artifact piece,
  * and any sliding-window distinct count is answered by merging a
  * handful of STORED register rows (≤ 64 per day) instead of
  * re-scanning the events of every day in every window.
  *
  * Additivity is exact twice over: (a) HLL registers are max-folded,
  * and max over per-generation maxima ≡ max over the whole stream —
  * the per-generation `distinct()` is a volume optimization that
  * cannot change any register (rho is duplicate-insensitive);
  * (b) day attribution is per-row, so a late-arriving event lands in
  * its OWN day's register regardless of which generation delivered
  * it — out-of-order ingest needs no special handling, unlike a
  * watermark-closed streaming aggregate.
  *
  * An events file append advances the piece over only the new files
  * (O(new)); compaction folds the partials back to one row per
  * (day, register). Serving a 7-day sliding estimate over a year of
  * data reads ≤ 365×64 rows — corpus-size-independent, the dashboard
  * query shape at 100 TB of events.
  *
  * Reference behavior generalized: the reference's per-run counter
  * reports (`pyCassElastic.py:356-383`) as persistent, mergeable,
  * time-sliced state.
  */
object EventSketchStore {

  private def foldDayHll(df: DataFrame): DataFrame =
    df.groupBy("day", "register").agg(max("r").as("r"))

  private def handle(corpusPath: String) =
    IncrementalDocArtifact(corpusPath, "evsk1", Seq(
      Piece("dayhll",
        (raw, _) => {
          val active = Tables.normalizeEvents(raw)
            .select(expr("unix_millis(ts) div 86400000").as("day"),
              col("user_id"))
            .distinct()
          HyperLogLog.build(
            active.select(col("day"),
              col("user_id").cast("string").as("item")),
            col("item"), keys = Seq("day"))
        },
        fold = Some(foldDayHll))))

  /** Folded per-day HLL registers (day, register, r) of the distinct
    * active users; feed windowed merges to [[HyperLogLog.estimate]].
    *
    * The store's internal raw-event reads (advance, rebuild) run on a
    * [[Tables.eventsSession]] child — the nanos-type adaptation stays
    * scoped to this artifact's plans instead of flipping the shared
    * session's parquet semantics as a serve-path side effect.
    */
  def dayRegisters(spark: SparkSession, sfDir: String): DataFrame =
    foldDayHll(handle(s"$sfDir/events.parquet")
      .serve(Tables.eventsSession(spark), "dayhll"))

  /** Offline compaction hook. Compaction may advance the piece
    * (reading raw event files), so it runs on the same scoped child
    * session as [[dayRegisters]].
    */
  def compact(spark: SparkSession, corpusPath: String): Unit =
    handle(corpusPath).compact(Tables.eventsSession(spark))
}
