package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap > threshold starts a new session; <= threshold does not") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 100L, 2L), (1L, 101L, 3L), // session 1
      (1L, 300L, 4L),                               // gap 199 > 100 -> session 2
      (2L, 0L, 5L))                                 // other key
      .toDF("k", "t", "id")
    val out = Sessionize.assign(df, Seq("k"), "t", gapMs = 100L, tieBreak = Seq("id"))
      .select("id", "session_id").as[(Long, Long)].collect().toMap
    out(1L) shouldBe 1L
    out(2L) shouldBe 1L // gap exactly = threshold stays in session
    out(3L) shouldBe 1L
    out(4L) shouldBe 2L
    out(5L) shouldBe 1L
  }

  test("property: session ids are contiguous from 1 and split exactly at gaps") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 400L)))
    checkProp(gen, cases = 10) { rows =>
      val df = rows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "id")
      val got = Sessionize.assign(df, Seq("k"), "t", 50L, Seq("id"))
        .select("k", "t", "id", "session_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      got.groupBy(_._1).foreach { case (_, g) =>
        val ordered = g.sortBy(x => (x._2, x._3))
        var expected = 0L
        var prev = Option.empty[Long]
        ordered.foreach { case (_, t, _, sid) =>
          if (prev.forall(p => t - p > 50L)) expected += 1
          sid shouldBe expected
          prev = Some(t)
        }
      }
    }
  }

  test("summarize: bounds, counts, duration per session") {
    val df = Seq((1L, 0L, 1L), (1L, 40L, 2L), (1L, 200L, 3L)).toDF("k", "t", "id")
    val out = Sessionize.summarize(df, Seq("k"), "t", 100L, Seq("id"))
      .orderBy("session_id")
      .select("session_id", "session_start", "session_end", "n_events", "duration_ms")
      .as[(Long, Long, Long, Long, Long)].collect()
    out shouldBe Array((1L, 0L, 40L, 2L, 40L), (2L, 200L, 200L, 1L, 0L))
  }
}
