package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def changes(df: DataFrame): Set[(Long, String, Any, Any)] =
    df.select(col("k"), col("change_type"), col("old_v"), col("new_v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3))).toSet

  test("bootstrap emits the live snapshot as inserts; tick emits only the diff") {
    val store = Files.createTempDirectory("feed_store").toString
    val ckpt = Files.createTempDirectory("feed_ckpt").toString
    val io = new ParquetTableIO(store)
    io.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))

    val feed = new SnapshotChangeFeed(store, ckpt, Seq("k"))
    var got: Set[(Long, String, Any, Any)] = Set.empty
    feed.bootstrap(spark)(df => got = changes(df))
    got shouldBe Set((1L, "insert", null, "a"), (2L, "insert", null, "b"),
      (3L, "insert", null, "c"))

    // no new commit: caught up
    feed.tick(spark)(_ => fail("handler must not run when caught up")) shouldBe None

    // commit v2: update 2, delete 3, insert 4
    io.overwrite(Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v"))
    feed.tick(spark)(df => got = changes(df))
    got shouldBe Set((2L, "update", "b", "B"), (3L, "delete", "c", null),
      (4L, "insert", null, "d"))
  }

  test("a failed handler leaves the cursor put; the next tick replays the diff") {
    val store = Files.createTempDirectory("feed_store2").toString
    val ckpt = Files.createTempDirectory("feed_ckpt2").toString
    val io = new ParquetTableIO(store)
    io.overwrite(Seq((1L, "a")).toDF("k", "v"))
    val feed = new SnapshotChangeFeed(store, ckpt, Seq("k"))
    feed.bootstrap(spark)(_ => ())
    val v1 = feed.cursor.get

    io.overwrite(Seq((1L, "A")).toDF("k", "v"))
    intercept[RuntimeException] {
      feed.tick(spark)(_ => throw new RuntimeException("sink down"))
    }
    feed.cursor.get shouldBe v1 // not advanced

    var got: Set[(Long, String, Any, Any)] = Set.empty
    feed.tick(spark)(df => got = changes(df))
    got shouldBe Set((1L, "update", "a", "A"))
  }

  test("falling behind the retention window fails loudly, bootstrap recovers") {
    val store = Files.createTempDirectory("feed_store3").toString
    val ckpt = Files.createTempDirectory("feed_ckpt3").toString
    val io = new ParquetTableIO(store)
    io.overwrite(Seq((1L, "a")).toDF("k", "v"))
    val feed = new SnapshotChangeFeed(store, ckpt, Seq("k"))
    feed.bootstrap(spark)(_ => ())

    // two commits: cleanup retains current + previous only, so the
    // feed's cursored version is gone
    io.overwrite(Seq((1L, "b")).toDF("k", "v"))
    io.overwrite(Seq((1L, "c")).toDF("k", "v"))
    val e = intercept[IllegalStateException] {
      feed.tick(spark)(_ => ())
    }
    e.getMessage should include("fell behind")

    var got: Set[(Long, String, Any, Any)] = Set.empty
    feed.bootstrap(spark)(df => got = changes(df))
    got shouldBe Set((1L, "insert", null, "c"))
    feed.tick(spark)(_ => fail("caught up after bootstrap")) shouldBe None
  }

  test("tick before bootstrap is refused") {
    val store = Files.createTempDirectory("feed_store4").toString
    val ckpt = Files.createTempDirectory("feed_ckpt4").toString
    new ParquetTableIO(store).overwrite(Seq((1L, "a")).toDF("k", "v"))
    val feed = new SnapshotChangeFeed(store, ckpt, Seq("k"))
    intercept[IllegalStateException] { feed.tick(spark)(_ => ()) }
  }
}
