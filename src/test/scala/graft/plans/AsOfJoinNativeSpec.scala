package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.operators.AsOfJoin

/** The whole-operator Catalyst path: AsOfJoinPlan → AsOfJoinStrategy →
  * sort-merge AsOfJoinExec, plus the PushFilterThroughAsOfJoin rule.
  */
class AsOfJoinNativeSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def left3 = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
    .toDF("k", "t", "l_name")
  private def right3 = Seq((1L, 10L, "v_at_10"), (1L, 15L, "v_at_15"), (2L, 9L, "v_at_9"))
    .toDF("k", "t", "r_name")

  test("matches latest right row at-or-before each left row, per key") {
    val out = AsOfJoin.asOfNative(left3, right3, Seq("k"), "t")
      .select("l_name", "r_name").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    out("p1") shouldBe Some("v_at_10") // equal ts matches (<=, not <)
    out("p2") shouldBe Some("v_at_15") // latest preceding wins
    out("p3") shouldBe None            // right row is AFTER the left row
  }

  test("output schema: left columns then nullable right payload") {
    val out = AsOfJoin.asOfNative(left3, right3, Seq("k"), "t")
    out.columns.toSeq shouldBe Seq("k", "t", "l_name", "r_name")
    out.schema("r_name").nullable shouldBe true
  }

  test("property: native and union+window forms agree row-for-row") {
    val rowGen = Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 50L))
    val dataGen = Gen.zip(Gen.listOfN(30, rowGen), Gen.listOfN(20, rowGen))
    checkProp(dataGen, cases = 8) { case (lRows, rRows) =>
      val rUnique = rRows.distinct // unique right (k, t) per contract
      val left = lRows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val right = rUnique.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "rid")
      assertSameRows(
        AsOfJoin.asOfNative(left, right, Seq("k"), "t"),
        AsOfJoin.asOf(left, right, Seq("k"), "t"))
    }
  }

  test("multi-key grouping and empty right side") {
    val left = Seq((1L, "a", 10L, 1L), (1L, "b", 10L, 2L)).toDF("k1", "k2", "t", "lid")
    val right = Seq((1L, "a", 9L, 100L)).toDF("k1", "k2", "t", "rid")
    val out = AsOfJoin.asOfNative(left, right, Seq("k1", "k2"), "t")
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    out shouldBe Map(1L -> 100L, 2L -> -1L) // k2 mismatch gets no match
    val empty = Seq.empty[(Long, String, Long, Long)].toDF("k1", "k2", "t", "rid")
    AsOfJoin.asOfNative(left, empty, Seq("k1", "k2"), "t").count() shouldBe 2
  }

  test("plan shape: AsOfJoinExec with one exchange per side, no join/window") {
    val out = AsOfJoin.asOfNative(left3, right3, Seq("k"), "t")
    out.collect() // finalize any adaptive plan
    val plan = out.queryExecution.executedPlan
    collect(plan) { case e: AsOfJoinExec => e } should have size 1
    val s = plan.toString
    s should not include "SortMergeJoin"
    s should not include "BroadcastNestedLoopJoin"
    s should not include "Window"
    collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    } should have size 2 // one hash exchange per side
  }

  test("left-only filters sink below the operator into the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("asof").toString
    left3.write.parquet(s"$dir/l"); right3.write.parquet(s"$dir/r")
    val out = AsOfJoin.asOfNative(
      spark.read.parquet(s"$dir/l"), spark.read.parquet(s"$dir/r"), Seq("k"), "t")
      .filter(col("l_name") =!= "p3")
    out.collect()
    val plan = out.queryExecution.executedPlan
    // the conjunct reached the left scan as a pushed filter…
    val scans = collect(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_.contains("l_name"))),
      s"no pushed l_name filter in:\n$plan")
    // …and no Filter node sits above the as-of operator
    val aboveOp = plan.collectFirst {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.collectFirst { case e: AsOfJoinExec => e }.isDefined => f
    }
    aboveOp shouldBe None
  }
}
