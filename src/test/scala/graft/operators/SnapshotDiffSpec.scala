package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "a", 10L),          // unchanged
    (2L, "b", 20L),          // payload change -> update
    (3L, "c", 30L),          // key absent in new -> delete
    (5L, null.asInstanceOf[String], 50L)) // null -> value: update
    .toDF("id", "payload", "v")

  private val newSnap = Seq(
    (1L, "a", 10L),
    (2L, "B", 20L),
    (4L, "d", 40L),          // key absent in old -> insert
    (5L, "e", 50L))
    .toDF("id", "payload", "v")

  test("classifies insert/update/delete and drops unchanged") {
    val got = SnapshotDiff.diff(oldSnap, newSnap, Seq("id"))
      .select("id", "change_type").as[(Long, String)].collect().toMap
    got shouldBe Map(2L -> "update", 3L -> "delete", 4L -> "insert", 5L -> "update")
  }

  test("carries both sides' payloads, null-padded on the missing side") {
    val rows = SnapshotDiff.diff(oldSnap, newSnap, Seq("id"))
      .collect().map(r => r.getLong(r.fieldIndex("id")) -> r).toMap
    rows(4L).getAs[String]("old_payload") shouldBe null
    rows(4L).getAs[String]("new_payload") shouldBe "d"
    rows(3L).getAs[String]("old_payload") shouldBe "c"
    rows(3L).getAs[String]("new_payload") shouldBe null
    rows(2L).getAs[String]("old_payload") shouldBe "b"
    rows(2L).getAs[String]("new_payload") shouldBe "B"
  }

  test("null <=> null is not a change; null <=> value is") {
    val o = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("id", "p")
    val n = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("id", "p")
    val got = SnapshotDiff.diff(o, n, Seq("id"))
      .select("id", "change_type").as[(Long, String)].collect().toMap
    got shouldBe Map(2L -> "update")
  }

  test("compareCols restricts what counts as a change") {
    // v changed on id 1 but only `payload` is compared
    val o = Seq((1L, "a", 10L)).toDF("id", "payload", "v")
    val n = Seq((1L, "a", 99L)).toDF("id", "payload", "v")
    SnapshotDiff.diff(o, n, Seq("id"), compareCols = Seq("payload"))
      .count() shouldBe 0
    SnapshotDiff.diff(o, n, Seq("id"), compareCols = Seq("v"))
      .select("change_type").as[String].collect() shouldBe Array("update")
  }

  test("identical snapshots produce an empty diff") {
    SnapshotDiff.diff(oldSnap, oldSnap, Seq("id")).count() shouldBe 0
  }

  test("diff applied to old reconstructs new (CDC round trip)") {
    val d = SnapshotDiff.diff(oldSnap, newSnap, Seq("id"))
    val upserts = d.filter(col("change_type") =!= "delete")
      .select(col("id"), col("new_payload").as("payload"), col("new_v").as("v"))
    val deletes = d.filter(col("change_type") === "delete").select("id")
    val rebuilt = oldSnap
      .join(d.select("id"), Seq("id"), "left_anti") // untouched keys
      .unionByName(upserts)
    assertSameRows(rebuilt, newSnap)
    deletes.as[Long].collect() shouldBe Array(3L)
  }
}
