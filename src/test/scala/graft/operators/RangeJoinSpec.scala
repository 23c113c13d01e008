package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("boundaries: start inclusive, end exclusive, across bucket edges") {
    val points = Seq((1L, 10L, "at_start"), (1L, 19L, "inside"),
      (1L, 20L, "at_end"), (1L, 9L, "before"), (2L, 15L, "other_key"))
      .toDF("k", "v", "name")
    // interval [10, 20) for key 1; bucket width 7 so it spans buckets
    val ivals = Seq((1L, 10L, 20L)).toDF("k", "s", "e")
    val hit = RangeJoin.join(points, ivals, Seq("k"), "v", "s", "e", 7L)
      .select("name").as[String].collect().toSet
    hit shouldBe Set("at_start", "inside")
  }

  test("interval ending exactly on a bucket boundary stays out of that bucket") {
    val points = Seq((1L, 14L, "in_next_bucket")).toDF("k", "v", "name")
    val ivals = Seq((1L, 0L, 14L)).toDF("k", "s", "e") // [0,14), width 7
    RangeJoin.join(points, ivals, Seq("k"), "v", "s", "e", 7L).count() shouldBe 0
  }

  test("property: equals the brute-force inequality join") {
    val pGen = Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 60L))
    val iGen = Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 50L), Gen.chooseNum(1L, 25L))
    checkProp(Gen.zip(Gen.listOfN(25, pGen), Gen.listOfN(8, iGen)), cases = 8) {
      case (ps, is) =>
        val points = ps.zipWithIndex.map { case ((k, v), id) => (k, v, id.toLong) }
          .toDF("k", "v", "pid")
        val ivals = is.zipWithIndex.map { case ((k, s, len), id) => (k, s, s + len, id.toLong) }
          .toDF("k", "s", "e", "iid")
        val got = RangeJoin.join(points, ivals, Seq("k"), "v", "s", "e", 9L)
          .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val expected = (for {
          ((pk, v), pid) <- ps.zipWithIndex
          ((ik, s, len), iid) <- is.zipWithIndex
          if pk == ik && s <= v && v < s + len
        } yield (pid.toLong, iid.toLong)).toSet
        got shouldBe expected
    }
  }

  test("fractional double endpoints: last bucket still covered, end exclusive") {
    // [10.0, 10.5) with width 1 lives entirely in bucket 10; the old
    // floor((end-1)/width) form skipped that bucket for fractional ends.
    val points = Seq((1L, 10.25, "inside"), (1L, 10.5, "at_end"), (1L, 9.75, "before"))
      .toDF("k", "v", "name")
    val ivals = Seq((1L, 10.0, 10.5)).toDF("k", "s", "e")
    RangeJoin.join(points, ivals, Seq("k"), "v", "s", "e", 1L)
      .select("name").as[String].collect().toSet shouldBe Set("inside")
  }

  test("integral endpoints past 2^53 (epoch-nanos magnitude) stay exact") {
    // 2^53+3 is not representable as a double (spacing is 2 up there):
    // the old floor(col/width) double path rounded the point to a
    // bucket the interval's shrunk last bucket never reached. The
    // integer floor-division path must keep the pair.
    val base = 1L << 53
    val points = Seq((1L, base + 3, "in"), (1L, base + 7, "out"))
      .toDF("k", "v", "name")
    val ivals = Seq((1L, base + 1, base + 4)).toDF("k", "s", "e")
    RangeJoin.join(points, ivals, Seq("k"), "v", "s", "e", 3L)
      .select("name").as[String].collect().toSet shouldBe Set("in")
    // and negative magnitudes floor correctly too
    val nPoints = Seq((1L, -(base + 3), "neg")).toDF("k", "v", "name")
    val nIvals = Seq((1L, -(base + 4), -(base + 1))).toDF("k", "s", "e")
    RangeJoin.join(nPoints, nIvals, Seq("k"), "v", "s", "e", 3L)
      .count() shouldBe 1
  }

  test("intervalJoin: integral endpoints past 2^53 pin to a bucket both sides exploded") {
    val base = 1L << 53
    val l = Seq((1L, base + 1, base + 5, 1L)).toDF("k", "ls", "le", "lid")
    val r = Seq((1L, base + 3, base + 9, 2L)).toDF("k", "rs", "re", "rid")
    RangeJoin.intervalJoin(l, r, Seq("k"), "ls", "le", "rs", "re", 3L)
      .count() shouldBe 1
  }

  test("degenerate intervals (end <= start) match nothing and don't blow up") {
    val points = Seq((1L, 10L, "p")).toDF("k", "v", "name")
    val ivals = Seq((1L, 10L, 10L), (1L, 20L, 5L)).toDF("k", "s", "e")
    RangeJoin.join(points, ivals, Seq("k"), "v", "s", "e", 7L).count() shouldBe 0
  }

  test("result is invariant to bucketWidth (pure tuning knob)") {
    val ps = (0 until 30).map(i => (i.toLong % 3, (i * 7L) % 50, i.toLong))
    val is = (0 until 6).map(i => (i.toLong % 3, i * 8L, i * 8L + 12, i.toLong))
    val points = ps.toDF("k", "v", "pid")
    val ivals = is.toDF("k", "s", "e", "iid")
    def run(w: Long) = RangeJoin.join(points, ivals, Seq("k"), "v", "s", "e", w)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = run(9L)
    Seq(1L, 3L, 17L, 1000L).foreach(w => withClue(s"width=$w: ")(run(w) shouldBe base))
  }

  test("plan shape: equi-join on (key, bucket), no nested-loop join") {
    val points = Seq((1L, 10L, 1L)).toDF("k", "v", "pid")
    val ivals = Seq((1L, 0L, 20L, 1L)).toDF("k", "s", "e", "iid")
    val plan = RangeJoin.join(points, ivals, Seq("k"), "v", "s", "e", 7L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("intervalJoin property: equals brute-force overlap join, each pair once") {
    val iGen = Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 50L), Gen.chooseNum(1L, 25L))
    checkProp(Gen.zip(Gen.listOfN(10, iGen), Gen.listOfN(10, iGen)), cases = 8) {
      case (ls, rs) =>
        val l = ls.zipWithIndex.map { case ((k, s, len), id) => (k, s, s + len, id.toLong) }
          .toDF("k", "ls", "le", "lid")
        val r = rs.zipWithIndex.map { case ((k, s, len), id) => (k, s, s + len, id.toLong) }
          .toDF("k", "rs", "re", "rid")
        // collect as a LIST: any pair emitted twice must fail, not be
        // absorbed by the set
        val got = RangeJoin.intervalJoin(l, r, Seq("k"), "ls", "le", "rs", "re", 9L)
          .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toList
        val expected = (for {
          ((lk, s1, len1), lid) <- ls.zipWithIndex
          ((rk, s2, len2), rid) <- rs.zipWithIndex
          if lk == rk && s1 < s2 + len2 && s2 < s1 + len1
        } yield (lid.toLong, rid.toLong)).toList
        got.sorted shouldBe expected.sorted
    }
  }

  test("intervalJoin: touching endpoints (half-open) do not overlap") {
    val l = Seq((1L, 0L, 10L, 1L)).toDF("k", "ls", "le", "lid")
    val r = Seq((1L, 10L, 20L, 2L)).toDF("k", "rs", "re", "rid")
    RangeJoin.intervalJoin(l, r, Seq("k"), "ls", "le", "rs", "re", 7L)
      .count() shouldBe 0
  }

  test("intervalJoin: result invariant to bucketWidth") {
    val ls = (0 until 12).map(i => (i.toLong % 3, i * 4L, i * 4L + 9, i.toLong))
    val rs = (0 until 12).map(i => (i.toLong % 3, i * 5L, i * 5L + 7, i.toLong))
    val l = ls.toDF("k", "ls", "le", "lid")
    val r = rs.toDF("k", "rs", "re", "rid")
    def run(w: Long) =
      RangeJoin.intervalJoin(l, r, Seq("k"), "ls", "le", "rs", "re", w)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    val base = run(9L)
    Seq(1L, 4L, 31L, 1000L).foreach(w => withClue(s"width=$w: ")(run(w) shouldBe base))
  }
}
