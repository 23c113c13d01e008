package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sketch.HyperLogLog
import graft.sources.ParquetTableIO

/** Streamed per-day registers ≡ the one-shot build over all events
  * (late arrivals included), and replay safety comes from the
  * max-fold's idempotence — no marker, re-merging a delivered batch
  * is a no-op by algebra.
  */
class StreamingEventSketchSpec extends SparkSpec {
  import spark.implicits._

  private def oneShot(rows: Seq[(Long, String)]): DataFrame =
    HyperLogLog.build(
      rows.toDF("user_id", "tss")
        .select(expr("unix_millis(to_timestamp(tss)) div 86400000").as("day"),
          col("user_id").cast("string").as("item")).distinct(),
      col("item"), keys = Seq("day"))

  private def streamOf(mem: MemoryStream[(Long, String)]): DataFrame =
    mem.toDF().toDF("user_id", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  private val b1 = Seq(
    (10L, "2024-01-01 10:00:00"), (11L, "2024-01-01 11:00:00"),
    (10L, "2024-01-01 12:00:00"), // same-day duplicate user
    (12L, "2024-01-02 09:00:00"))
  private val b2 = Seq(
    (13L, "2024-01-03 08:00:00"),  // new day
    (14L, "2024-01-01 23:59:00"))  // LATE arrival for day 1

  test("micro-batches (incl. late events) fold to the one-shot register table") {
    implicit val sql = spark.sqlContext
    val base = Files.createTempDirectory("sevsk")
    val io = new ParquetTableIO(base.resolve("regs").toString)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingEventSketch.start(spark, streamOf(mem), "user_id", "ts",
      io, base.resolve("ckpt").toString,
      Trigger.ProcessingTime("50 milliseconds"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val stored = io.read(spark)
    assertSameRows(stored, oneShot(b1 ++ b2))
    // the late day-1 event is IN day 1's estimate, no reprocessing
    assertSameRows(
      HyperLogLog.estimate(stored, keys = Seq("day")),
      HyperLogLog.estimate(oneShot(b1 ++ b2), keys = Seq("day")))
  }

  test("replayed batch is absorbed by max-fold idempotence, no marker needed") {
    implicit val sql = spark.sqlContext
    val base = Files.createTempDirectory("sevskr")
    val io = new ParquetTableIO(base.resolve("regs").toString)
    // crash-after-commit simulation: the store already holds batch
    // 0's registers, and the restarted stream re-delivers batch 0
    io.overwrite(oneShot(b1))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingEventSketch.start(spark, streamOf(mem), "user_id", "ts",
      io, base.resolve("ckpt").toString,
      Trigger.ProcessingTime("50 milliseconds"))
    mem.addData(b1: _*); q.processAllAvailable() // replay of batch 0
    mem.addData(b2: _*); q.processAllAvailable() // genuinely new
    q.stop()
    // max(max(x), x) = max(x): the double delivery left no trace
    assertSameRows(io.read(spark), oneShot(b1 ++ b2))
  }
}
