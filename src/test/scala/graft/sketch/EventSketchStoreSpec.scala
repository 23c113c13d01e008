package graft.sketch

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.sources.ArtifactStore

/** Per-day HLL registers as a stored artifact: stored ≡ the inline
  * whole-stream build bit-for-bit, appends advance O(new), a LATE
  * event merges into its own (old) day's register without any
  * reprocessing of that day, and serving scans no event files.
  */
class EventSketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private def newCorpus(tag: String): (String, String) = {
    val sf = Files.createTempDirectory(s"graft-evsk-$tag").toString
    (sf, s"$sf/events.parquet")
  }

  private def writeEvents(corpus: String, mode: String,
      rows: (Long, Long, String)*): Unit =
    rows.toDF("event_id", "user_id", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
      .coalesce(1).write.mode(mode).parquet(corpus)

  private def inline(corpus: String): DataFrame = {
    val active = Tables.normalizeEvents(spark.read.parquet(corpus))
      .select(expr("unix_millis(ts) div 86400000").as("day"), col("user_id"))
      .distinct()
    HyperLogLog.build(
      active.select(col("day"), col("user_id").cast("string").as("item")),
      col("item"), keys = Seq("day"))
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private val day1 = Seq[(Long, Long, String)](
    (1L, 10L, "2024-01-01 10:00:00"),
    (2L, 11L, "2024-01-01 11:00:00"),
    (3L, 10L, "2024-01-01 12:00:00"), // duplicate user, same day
    (4L, 12L, "2024-01-02 09:00:00"),
    (5L, 13L, "2024-01-03 09:30:00"))

  private val lateAndNew = Seq[(Long, Long, String)](
    (6L, 14L, "2024-01-04 08:00:00"),  // new day
    (7L, 15L, "2024-01-01 23:59:00"))  // LATE arrival for day 1

  test("stored registers equal the inline whole-stream build; serve scans no events") {
    val (sf, corpus) = newCorpus("fresh")
    writeEvents(corpus, "overwrite", day1: _*)
    val stored = EventSketchStore.dayRegisters(spark, sf)
    assert(rows(stored) === rows(inline(corpus)))
    val scans = stored.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(scans.nonEmpty)
    scans.foreach(p => assert(p.contains(ArtifactStore.root),
      s"serve plan scans outside the store: $p"))
  }

  test("append with a late event advances O(new) and merges into the old day") {
    val (sf, corpus) = newCorpus("late")
    writeEvents(corpus, "overwrite", day1: _*)
    EventSketchStore.dayRegisters(spark, sf).collect() // build base
    writeEvents(corpus, "append", lateAndNew: _*)
    val stored = EventSketchStore.dayRegisters(spark, sf)
    // the late event's register contribution lands in day 1's rows
    // purely through the max-fold — identical to a full rebuild
    assert(rows(stored) === rows(inline(corpus)))
    // estimates therefore match a from-scratch sketch per day
    assert(rows(HyperLogLog.estimate(stored, keys = Seq("day"))) ===
      rows(HyperLogLog.estimate(inline(corpus), keys = Seq("day"))))
  }
}
