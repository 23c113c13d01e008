package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("grid is contiguous per key over [first, last] and gaps forward-fill") {
    val ev = Seq(
      ("u1", 1000L, 1.0), ("u1", 1500L, 2.0), // tick 1000 -> 3.0
      ("u1", 4100L, 5.0),                     // tick 4000; 2000/3000 are gaps
      ("u2", 2000L, 7.0))
      .toDF("k", "ts", "v")
    val got = TimeSeries.gapFillFfill(ev, "k", "ts", "v", stepMs = 1000L)
      .orderBy("k", "tick_ms")
      .select("k", "tick_ms", "v_obs", "v_ffill", "is_gap")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)), r.getDouble(3), r.getBoolean(4)))
    got shouldBe Array(
      ("u1", 1000L, Some(3.0), 3.0, false),
      ("u1", 2000L, None, 3.0, true),
      ("u1", 3000L, None, 3.0, true),
      ("u1", 4000L, Some(5.0), 5.0, false),
      ("u2", 2000L, Some(7.0), 7.0, false))
  }

  test("single-observation key yields exactly one tick, no gaps") {
    val ev = Seq(("u", 5500L, 9.0)).toDF("k", "ts", "v")
    val got = TimeSeries.gapFillFfill(ev, "k", "ts", "v", 1000L).collect()
    got.length shouldBe 1
    got.head.getAs[Long]("tick_ms") shouldBe 5000L
    got.head.getAs[Boolean]("is_gap") shouldBe false
  }

  test("property: tick count = span/step + 1, first/last ticks observed, ffill never null") {
    val gen = Gen.listOfN(12, Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 100000L)))
    checkProp(gen, cases = 8) { evs =>
      val df = evs.map { case (k, ts) => (s"u$k", ts, 1.0) }.toDF("k", "ts", "v")
      val out = TimeSeries.gapFillFfill(df, "k", "ts", "v", 7000L)
        .select("k", "tick_ms", "v_ffill", "is_gap").collect()
      out.foreach(r => assert(!r.isNullAt(2), "v_ffill must never be null"))
      val byKey = out.groupBy(_.getString(0))
      evs.groupBy(_._1).foreach { case (k, rows) =>
        val ticks = rows.map(_._2 / 7000L * 7000L)
        val (t0, t1) = (ticks.min, ticks.max)
        val grid = byKey(s"u$k").map(_.getLong(1)).sorted
        grid shouldBe (t0 to t1 by 7000L).toArray
        // first and last grid ticks are real observations, not gaps
        val gaps = byKey(s"u$k").map(r => r.getLong(1) -> r.getBoolean(3)).toMap
        gaps(t0) shouldBe false
        gaps(t1) shouldBe false
      }
    }
  }

  test("negative (pre-1970) timestamps bucket by floor, not truncation") {
    val ev = Seq(("u", -1L, 1.0), ("u", 1L, 2.0), ("u", -3599999L, 4.0))
      .toDF("k", "ts", "v")
    val ticks = TimeSeries.gapFillFfill(ev, "k", "ts", "v", 3600000L)
      .filter(!org.apache.spark.sql.functions.col("is_gap"))
      .select("tick_ms", "v_obs").as[(Long, Double)].collect().toMap
    // -1 and -3599999 share floor bucket -3600000; +1 sits in bucket 0
    ticks shouldBe Map(-3600000L -> 5.0, 0L -> 2.0)
  }

  test("observed ticks aggregate (sum) all events in the bucket") {
    val ev = Seq(("u", 100L, 1.5), ("u", 900L, 2.5), ("u", 999L, 1.0))
      .toDF("k", "ts", "v")
    val row = TimeSeries.gapFillFfill(ev, "k", "ts", "v", 1000L).collect().head
    row.getAs[Double]("v_obs") shouldBe 5.0
  }
}
