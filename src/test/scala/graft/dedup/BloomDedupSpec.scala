package graft.dedup

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  test("property: exactly equals the plain left-anti join") {
    // fingerprints drawn from a small alphabet so batch/seen overlap a lot
    val fpGen = Gen.chooseNum(0, 40).map(i => s"fp$i")
    checkProp(Gen.zip(Gen.listOfN(30, fpGen), Gen.listOfN(30, fpGen)), cases = 8) {
      case (batchFps, seenFps) =>
        val batch = batchFps.zipWithIndex.map { case (fp, i) => (i.toLong, fp) }
          .toDF("id", "fp")
        val seen = seenFps.toDF("fp")
        assertSameRows(
          BloomDedup.newRows(batch, seen, "fp", expectedItems = 100),
          batch.join(seen, Seq("fp"), "left_anti"))
    }
  }

  test("all-new batch survives intact; all-seen batch vanishes") {
    val seen = (0 until 50).map(i => s"s$i").toDF("fp")
    val fresh = (0 until 20).map(i => (i.toLong, s"n$i")).toDF("id", "fp")
    BloomDedup.newRows(fresh, seen, "fp", 100).count() shouldBe 20
    val dup = (0 until 20).map(i => (i.toLong, s"s$i")).toDF("id", "fp")
    BloomDedup.newRows(dup, seen, "fp", 100).count() shouldBe 0
  }

  test("high fpp still yields the exact result (refinement catches FPs)") {
    val seen = (0 until 200).map(i => s"s$i").toDF("fp")
    val batch = (0 until 200).map(i => (i.toLong, if (i % 2 == 0) s"s$i" else s"n$i"))
      .toDF("id", "fp")
    // fpp=0.5 forces many false positives through the residue path
    assertSameRows(
      BloomDedup.newRows(batch, seen, "fp", expectedItems = 200, fpp = 0.5),
      batch.join(seen, Seq("fp"), "left_anti"))
  }

  test("duplicate fingerprints WITHIN the batch are all kept (dedup vs seen only)") {
    val seen = Seq("x").toDF("fp")
    val batch = Seq((1L, "y"), (2L, "y"), (3L, "x")).toDF("id", "fp")
    BloomDedup.newRows(batch, seen, "fp", 10)
      .select("id").as[Long].collect().sorted shouldBe Array(1L, 2L)
  }

  test("no UDF, no manual broadcast: the probe is an expression") {
    val seen = (0 until 30).map(i => s"s$i").toDF("fp")
    val batch = (0 until 30).map(i => (i.toLong, s"b$i")).toDF("id", "fp")
    val plan = BloomDedup.newRows(batch, seen, "fp", 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"),
      s"expected a pure-expression plan, got:\n$plan")
    assert(plan.contains("might_contain"), s"expected might_contain probe in:\n$plan")
  }

  test("property: stacked filters (m>1) exactly equal the plain anti-join") {
    val fpGen = Gen.chooseNum(0, 40).map(i => s"fp$i")
    checkProp(Gen.zip(Gen.listOfN(30, fpGen), Gen.listOfN(30, fpGen),
      Gen.oneOf(1, 3, 8)), cases = 6) {
      case (batchFps, seenFps, m) =>
        val batch = batchFps.zipWithIndex.map { case (fp, i) => (i.toLong, fp) }
          .toDF("id", "fp")
        val seen = seenFps.toDF("fp")
        assertSameRows(
          BloomDedup.newRowsStacked(batch, seen, "fp", expectedItems = 100, stacks = m),
          batch.join(seen, Seq("fp"), "left_anti"))
    }
  }

  test("stacked: adversarial fpp and empty seen set stay exact") {
    val seen = (0 until 200).map(i => s"s$i").toDF("fp")
    val batch = (0 until 200).map(i => (i.toLong, if (i % 2 == 0) s"s$i" else s"n$i"))
      .toDF("id", "fp")
    assertSameRows(
      BloomDedup.newRowsStacked(batch, seen, "fp", 200, fpp = 0.5, stacks = 4),
      batch.join(seen, Seq("fp"), "left_anti"))
    val empty = Seq.empty[String].toDF("fp")
    BloomDedup.newRowsStacked(batch, empty, "fp", 10, stacks = 4).count() shouldBe 200
  }

  test("stacked: a slice with no seen rows proves its batch rows new") {
    // one seen row => exactly one populated slice out of 8; rows whose
    // hash lands elsewhere must come back without consulting any filter
    val seen = Seq("only").toDF("fp")
    val batch = (0 until 100).map(i => (i.toLong, s"fp$i")).toDF("id", "fp")
    assertSameRows(
      BloomDedup.newRowsStacked(batch, seen, "fp", 10, stacks = 8),
      batch.join(seen, Seq("fp"), "left_anti"))
  }
}
