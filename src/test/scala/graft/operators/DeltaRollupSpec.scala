package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{ParquetTableIO, SnapshotChangeFeed}

class DeltaRollupSpec extends SparkSpec {
  import spark.implicits._

  private def stateOf(df: DataFrame): Map[String, (Long, Double)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  private def direct(snap: DataFrame): Map[String, (Long, Double)] =
    stateOf(snap.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v")))

  test("insert/update/delete deltas reproduce the direct aggregate") {
    val v1 = Seq((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 7.0))
      .toDF("k", "grp", "v")
    val v2 = Seq((1L, "a", 12.0), (3L, "b", 7.0), (4L, "b", 1.0))
      .toDF("k", "grp", "v") // update 1, delete 2, insert 4
    val diff = SnapshotDiff.diff(v1, v2, Seq("k", "grp"))
    val s0 = v1.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("sum_v"))
    val s1 = DeltaRollup(s0, diff, Seq("grp"), "v")
    stateOf(s1) shouldBe direct(v2)
  }

  test("a group emptied by deletes vanishes from the state") {
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 5.0)).toDF("k", "grp", "v")
    val v2 = Seq((1L, "a", 10.0)).toDF("k", "grp", "v")
    val s0 = v1.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("sum_v"))
    val s1 = DeltaRollup(s0, SnapshotDiff.diff(v1, v2, Seq("k", "grp")),
      Seq("grp"), "v")
    stateOf(s1).keySet shouldBe Set("a")
  }

  test("random change sequences: maintained state always equals direct recompute") {
    val rnd = new scala.util.Random(7)
    var snap = (1L to 30L).map(k => (k, s"g${k % 4}", rnd.nextInt(100).toDouble))
    var state = DeltaRollup.init(
      SnapshotDiff.diff(snap.toDF("k", "grp", "v").limit(0),
        snap.toDF("k", "grp", "v"), Seq("k", "grp")),
      Seq("grp"), "v")
    for (step <- 1 to 5) {
      val next = snap
        .filterNot(_ => rnd.nextDouble() < 0.2) // deletes
        .map { case (k, g, v) =>
          if (rnd.nextDouble() < 0.3) (k, g, v + 1.0) else (k, g, v) // updates
        } ++ (1 to 3).map(i => (100L * step + i, s"g${rnd.nextInt(4)}",
          rnd.nextInt(100).toDouble)) // inserts
      val diff = SnapshotDiff.diff(snap.toDF("k", "grp", "v"),
        next.toDF("k", "grp", "v"), Seq("k", "grp"))
      state = DeltaRollup(state, diff, Seq("grp"), "v")
      withClue(s"step $step: ") {
        stateOf(state) shouldBe direct(next.toDF("k", "grp", "v"))
      }
      snap = next
    }
  }

  test("end to end: change feed ticks maintain the view without snapshot rescans") {
    val store = Files.createTempDirectory("ivm_store").toString
    val ckpt = Files.createTempDirectory("ivm_ckpt").toString
    val io = new ParquetTableIO(store)
    io.overwrite(Seq((1L, "a", 10.0), (2L, "b", 5.0)).toDF("k", "grp", "v"))
    val feed = new SnapshotChangeFeed(store, ckpt, Seq("k", "grp"))
    var state: DataFrame = null
    feed.bootstrap(spark)(ch => state = DeltaRollup.init(ch, Seq("grp"), "v"))
    stateOf(state) shouldBe Map("a" -> (1L, 10.0), "b" -> (1L, 5.0))

    // update 1, delete 2, insert 3
    io.overwrite(Seq((1L, "a", 11.0), (3L, "b", 2.0)).toDF("k", "grp", "v"))
    feed.tick(spark)(ch => state = DeltaRollup(state, ch, Seq("grp"), "v"))
    stateOf(state) shouldBe Map("a" -> (1L, 11.0), "b" -> (1L, 2.0))
  }
}
