package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
