package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches latest right row at-or-before each left row, per key") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "l_name")
    val right = Seq((1L, 10L, "v_at_10"), (1L, 15L, "v_at_15"), (2L, 9L, "v_at_9"))
      .toDF("k", "t", "r_name")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t")
      .select("l_name", "r_name").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    out("p1") shouldBe Some("v_at_10") // equal ts matches (<=, not <)
    out("p2") shouldBe Some("v_at_15") // latest preceding wins
    out("p3") shouldBe None            // right row is AFTER the left row
  }

  test("property: equals the brute-force max-preceding join on random data") {
    val rowGen = Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 50L))
    val dataGen = Gen.zip(Gen.listOfN(30, rowGen), Gen.listOfN(20, rowGen))
    checkProp(dataGen, cases = 8) { case (lRows, rRows) =>
      // unique right (k, t) per the operator contract
      val rUnique = rRows.distinct.groupBy(identity).keys.toSeq
      val left = lRows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val right = rUnique.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "rid")

      val got = AsOfJoin.asOf(left, right, Seq("k"), "t")
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

      val rByK = rUnique.zipWithIndex.groupBy(_._1._1)
      val expected = lRows.zipWithIndex.map { case ((k, t), i) =>
        val best = rByK.getOrElse(k, Nil).filter(_._1._2 <= t)
          .sortBy(x => (x._1._2, x._2)).lastOption
        i.toLong -> best.map(_._2.toLong).getOrElse(-1L)
      }.toMap
      got shouldBe expected
    }
  }

  test("broadcast form agrees with the union+window form (property)") {
    val rowGen = Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 50L))
    val dataGen = Gen.zip(Gen.listOfN(30, rowGen), Gen.listOfN(20, rowGen))
    checkProp(dataGen, cases = 6) { case (lRows, rRows) =>
      val rUnique = rRows.distinct
      val left = lRows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val right = rUnique.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "rid")
      assertSameRows(
        AsOfJoin.asOfBroadcast(left, right, Seq("k"), "t"),
        AsOfJoin.asOf(left, right, Seq("k"), "t"))
    }
  }

  test("broadcast form: the left side is never shuffled") {
    val left = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "t", "l_name")
    val right = Seq((1L, 9L, "x")).toDF("k", "t", "r_name")
    val out = AsOfJoin.asOfBroadcast(left, right, Seq("k"), "t")
    out.count() shouldBe 2
    out.queryExecution.executedPlan.collectFirst {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    } shouldBe None
  }

  test("broadcast form refuses an oversized right side") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "l_name")
    val right = (0 until 10).map(i => (1L, i.toLong, s"r$i")).toDF("k", "t", "r_name")
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asOfBroadcast(left, right, Seq("k"), "t", maxRightRows = 5)
  }

  test("plan shape: one shuffle on the key, no cross/theta join") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "l_name")
    val right = Seq((1L, 9L, "b")).toDF("k", "t", "r_name")
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "t")
      .queryExecution.executedPlan.toString
    plan should not include "Join" // union + window, not a join at all
  }
}
