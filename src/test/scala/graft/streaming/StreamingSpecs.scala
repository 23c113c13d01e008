package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.core.{SideSpec, SyncSpec}
import graft.sources.ParquetTableIO
import graft.streaming.StatefulLww.KeyedVersioned

class StreamSyncSpec extends SparkSpec {
  import spark.implicits._

  private val spec = SyncSpec("stream", SideSpec("in"), SideSpec("dest"))

  test("file-stream sync: files land once, LWW across micro-batches, checkpoint resumes") {
    val base = Files.createTempDirectory("ss")
    val in = base.resolve("incoming").toString
    val ckpt = base.resolve("ckpt").toString
    val dest = new ParquetTableIO(base.resolve("dest").toString)
    Files.createDirectories(java.nio.file.Paths.get(in))

    def push(name: String, rows: (String, Long, String)*): Unit =
      rows.toDF("id", "version", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/$name")
    // file source watches a flat dir; write each drop as files within it
    def pushFlat(rows: (String, Long, String)*): Unit = {
      val tmp = base.resolve("tmp").toString
      rows.toDF("id", "version", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      Files.list(java.nio.file.Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
        .forEach { f =>
          Files.move(f, java.nio.file.Paths.get(in, f.getFileName.toString))
        }
    }

    val schema = Seq(("x", 1L, "t")).toDF("id", "version", "text").schema

    pushFlat(("a", 1L, "a-v1"), ("b", 5L, "b-v5"))
    val q1 = StreamSync.start(spark, in, schema, dest, spec, ckpt, Trigger.AvailableNow())
    q1.awaitTermination()
    dest.read(spark).as[(String, Long, String)].collect().toSet shouldBe
      Set(("a", 1L, "a-v1"), ("b", 5L, "b-v5"))

    // second drop: newer a, older (late) b, new c — restart from checkpoint
    pushFlat(("a", 2L, "a-v2"), ("b", 3L, "b-late"), ("c", 9L, "c-v9"))
    val q2 = StreamSync.start(spark, in, schema, dest, spec, ckpt, Trigger.AvailableNow())
    q2.awaitTermination()
    dest.read(spark).as[(String, Long, String)].collect().toSet shouldBe
      Set(("a", 2L, "a-v2"), ("b", 5L, "b-v5"), ("c", 9L, "c-v9"))

    // third run with NO new files: checkpoint prevents reprocessing
    val q3 = StreamSync.start(spark, in, schema, dest, spec, ckpt, Trigger.AvailableNow())
    q3.awaitTermination()
    dest.read(spark).count() shouldBe 3
  }
}

class WindowedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming tumbling agg equals the batch window aggregation") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDS().toDF("ts", "kind", "value")
    val q = WindowedStats.tumbling(df, "ts", "1 hour", "0 seconds",
        Seq("kind"), Some("value"))
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    val rows = Seq(
      (ts("2024-01-01 10:05:00"), "a", 1.0),
      (ts("2024-01-01 10:55:00"), "a", 2.0),
      (ts("2024-01-01 10:30:00"), "b", 5.0),
      (ts("2024-01-01 11:10:00"), "a", 7.0))
    mem.addData(rows: _*)
    q.processAllAvailable()
    val got = spark.table("win_out")
    val expected = WindowedStats.tumbling(
      rows.toDF("ts", "kind", "value"), "ts", "1 hour", "0 seconds",
      Seq("kind"), Some("value"))
    assertSameRows(got, expected)
    q.stop()
  }

  test("append mode: late rows beyond the watermark are dropped by the engine") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDS().toDF("ts", "kind", "value")
    val q = WindowedStats.tumbling(df, "ts", "1 hour", "0 seconds",
        Seq("kind"), None)
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()

    // batch 1: two rows in [10:00, 11:00) and one at 12:05 that will
    // advance the watermark past 11:00
    mem.addData((ts("2024-01-01 10:05:00"), "a", 0.0),
      (ts("2024-01-01 10:45:00"), "a", 0.0),
      (ts("2024-01-01 12:05:00"), "a", 0.0))
    q.processAllAvailable()
    // batch 2: a LATE row for the already-finalized window — dropped
    mem.addData((ts("2024-01-01 10:50:00"), "a", 0.0))
    q.processAllAvailable()
    // batch 3: advance watermark far enough to finalize everything open
    mem.addData((ts("2024-01-01 14:00:00"), "a", 0.0))
    q.processAllAvailable()

    val n10 = spark.table("late_out")
      .filter(col("win_start") === ts("2024-01-01 10:00:00"))
      .select("n").as[Long].collect()
    n10 shouldBe Array(2L) // the late 10:50 row did NOT make it 3
    q.stop()
  }
}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("dropDuplicatesWithinWatermark dedups across micro-batches with bounded state") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val q = mem.toDS().toDF("id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()

    mem.addData((1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:05:00")), // in-batch duplicate
      (2L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 10:20:00")), // cross-batch duplicate
      (3L, ts("2024-01-01 10:30:00")))
    q.processAllAvailable()

    val ids = spark.table("sdedup_out").select("id").as[Long].collect().sorted
    ids shouldBe Array(1L, 2L, 3L) // each id exactly once
    q.stop()
  }
}

class StatefulLwwSpec extends SparkSpec {
  import spark.implicits._

  test("emits only version-winning updates across micro-batches") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[KeyedVersioned]
    val q = StatefulLww.latestUpdates(mem.toDS())
      .writeStream.format("memory").queryName("lww_out")
      .outputMode("update").start()

    mem.addData(KeyedVersioned("a", 1, "a1"), KeyedVersioned("a", 3, "a3"),
      KeyedVersioned("b", 2, "b2"))
    q.processAllAvailable()
    // batch 1: per-key best only (a3 beats a1 within the batch)
    spark.table("lww_out").as[KeyedVersioned].collect().toSet shouldBe
      Set(KeyedVersioned("a", 3, "a3"), KeyedVersioned("b", 2, "b2"))

    mem.addData(KeyedVersioned("a", 2, "a2-late"), // loses to state 3
      KeyedVersioned("b", 2, "b2-tie"), // tie: incumbent kept, no emit
      KeyedVersioned("b", 7, "b7")) // wins
    q.processAllAvailable()
    spark.table("lww_out").as[KeyedVersioned].collect().toSet shouldBe
      Set(KeyedVersioned("a", 3, "a3"), KeyedVersioned("b", 2, "b2"),
        KeyedVersioned("b", 7, "b7"))
    q.stop()
  }
}
