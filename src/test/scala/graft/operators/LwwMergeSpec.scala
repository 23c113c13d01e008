package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** LWW merge — the engine's core operator (SURVEY.md §2.4 A1).
  * Scenario cases mirror the reference's `testBothSides`
  * (tests/testSyncClass.py:180-214); properties pin idempotence /
  * commutativity / side-tie semantics that the reference only gets
  * implicitly from ES external versioning.
  */
class LwwMergeSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", 1L, "a-old"), ("a", 3L, "a-new"), ("a", 2L, "a-mid"),
    ("b", 5L, "b-only"),
    ("c", 7L, "c-1"), ("c", 7L, "c-2") // version tie
  ).toDF("id", "version", "text")

  test("latestAgg keeps exactly the max-version row per key") {
    val out = LwwMerge.latestAgg(rows, Seq("id"), "version", Seq(col("text")))
      .as[(String, Long, String)].collect().sortBy(_._1)
    out shouldBe Array(("a", 3L, "a-new"), ("b", 5L, "b-only"), ("c", 7L, "c-2"))
  }

  test("latestWindow and latestAgg agree (same tie-breakers)") {
    val tie = Seq(col("text"))
    assertSameRows(
      LwwMerge.latestAgg(rows, Seq("id"), "version", tie),
      LwwMerge.latestWindow(rows, Seq("id"), "version", tie))
  }

  test("merge: newest version wins in both directions (testBothSides)") {
    // overlapping ids at different versions on the two sides — after
    // merge the newest version must win everywhere
    // (reference tests/testSyncClass.py:193-206).
    val dest = Seq(("x", 10L, "dest-x"), ("y", 20L, "dest-y")).toDF("id", "version", "text")
    val inc = Seq(("x", 11L, "inc-x"), ("y", 19L, "inc-y"), ("z", 1L, "inc-z"))
      .toDF("id", "version", "text")
    val out = LwwMerge.merge(dest, inc, Seq("id"), "version")
      .as[(String, Long, String)].collect().sortBy(_._1)
    out shouldBe Array(("x", 11L, "inc-x"), ("y", 20L, "dest-y"), ("z", 1L, "inc-z"))
  }

  test("merge: equal version keeps the incumbent (ES 409 rule)") {
    // ES external versioning 409s an equal version — the incumbent
    // stays (reference pyCassElastic.py:340-341).
    val dest = Seq(("x", 10L, "incumbent")).toDF("id", "version", "text")
    val inc = Seq(("x", 10L, "newcomer")).toDF("id", "version", "text")
    val out = LwwMerge.merge(dest, inc, Seq("id"), "version")
      .as[(String, Long, String)].collect()
    out shouldBe Array(("x", 10L, "incumbent"))
  }

  test("merge: same-store (id, version) duplicates resolve deterministically") {
    // Two rows in ONE store sharing (id, version): without a final
    // payload tie-breaker the winner is arbitrary, so a replayed run
    // could publish a different snapshot. Pin determinism across both
    // input orders.
    val dupA = Seq(("x", 10L, "p1"), ("x", 10L, "p2")).toDF("id", "version", "text")
    val dupB = Seq(("x", 10L, "p2"), ("x", 10L, "p1")).toDF("id", "version", "text")
    val empty = Seq.empty[(String, Long, String)].toDF("id", "version", "text")
    val w1 = LwwMerge.merge(dupA, empty, Seq("id"), "version").collect()
    val w2 = LwwMerge.merge(dupB, empty, Seq("id"), "version").collect()
    w1.length shouldBe 1
    w1 shouldBe w2
  }

  test("merge aligns differing schemas (missing columns null-padded)") {
    val dest = Seq(("x", 1L, "t")).toDF("id", "version", "text")
    val inc = Seq(("x", 2L, 9.5)).toDF("id", "version", "score")
    val out = LwwMerge.merge(dest, inc, Seq("id"), "version")
    out.columns.toSet shouldBe Set("id", "version", "text", "score")
    val r = out.collect().head
    r.getAs[Long]("version") shouldBe 2L
    assert(r.isNullAt(r.fieldIndex("text")))
    r.getAs[Double]("score") shouldBe 9.5
  }

  private val genRows: Gen[List[(String, Long, String)]] = Gen.listOf(for {
    id <- Gen.oneOf("a", "b", "c", "d")
    v <- Gen.chooseNum(0L, 8L)
    t <- Gen.alphaLowerStr.map(_.take(4))
  } yield (id, v, t))

  test("property: latestAgg is idempotent") {
    checkProp(genRows, cases = 8) { data =>
      if (data.nonEmpty) {
        val df = data.toDF("id", "version", "text")
        val once = LwwMerge.latestAgg(df, Seq("id"), "version", Seq(col("text")))
        val twice = LwwMerge.latestAgg(once, Seq("id"), "version", Seq(col("text")))
        assertSameRows(once, twice)
      }
    }
  }

  test("property: merging a side into itself is a no-op after dedup") {
    checkProp(genRows, cases = 8) { data =>
      if (data.nonEmpty) {
        val df = LwwMerge.latestAgg(
          data.toDF("id", "version", "text"), Seq("id"), "version", Seq(col("text")))
        assertSameRows(LwwMerge.merge(df, df, Seq("id"), "version"), df)
      }
    }
  }

  test("property: merge keeps max version per id from either side") {
    checkProp(Gen.zip(genRows, genRows), cases = 8) { case (a, b) =>
      if (a.nonEmpty || b.nonEmpty) {
        val da = a.toDF("id", "version", "text")
        val db = b.toDF("id", "version", "text")
        val merged = LwwMerge.merge(da, db, Seq("id"), "version")
          .select("id", "version").as[(String, Long)].collect().toMap
        val expected = (a ++ b).groupBy(_._1).map { case (id, rs) =>
          id -> rs.map(_._2).max
        }
        merged shouldBe expected
      }
    }
  }
}

class LwwHistorySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", 1L, "a-v1"), ("a", 3L, "a-v3"), ("a", 2L, "a-v2"),
    ("b", 5L, "b-v5")).toDF("id", "version", "text")

  test("validity intervals chain per key; exactly one current row each") {
    val h = LwwMerge.history(rows, Seq("id"), "version")
      .select("id", "valid_from", "valid_to")
      .as[(String, Long, Option[Long])].collect().toSet
    h shouldBe Set(
      ("a", 1L, Some(2L)), ("a", 2L, Some(3L)), ("a", 3L, None),
      ("b", 5L, None))
  }

  test("current rows of the history equal the LWW latest state") {
    val current = LwwMerge.history(rows, Seq("id"), "version")
      .filter(col("is_current"))
      .select("id", "version", "text")
    val latest = LwwMerge.latestAgg(rows, Seq("id"), "version")
    current.exceptAll(latest).count() shouldBe 0
    latest.exceptAll(current).count() shouldBe 0
  }
}
