package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(10.0), Some("a")),
    (2L, Some(-5.0), Some("b")),   // range violation
    (2L, Some(20.0), None),        // dup key + null name
    (3L, None, Some("c")))         // null value: not a range violation
    .toDF("id", "v", "name")

  private def results(checks: Seq[Checks.Check]): Map[String, (Long, Long)] =
    Checks.run(df, checks).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("row-level checks: nullability, range (nulls exempt), predicate") {
    val r = results(Seq(
      Checks.NotNull("name"),
      Checks.InRange("v", 0.0, 100.0),
      Checks.Satisfies("id_positive", col("id") > 0)))
    r("not_null(name)") shouldBe ((1L, 4L))
    r("in_range(v,0.0,100.0)") shouldBe ((1L, 4L)) // only -5.0; null exempt
    r("satisfies(id_positive)") shouldBe ((0L, 4L))
  }

  test("null predicate results count as violations (satisfies is null-strict)") {
    val r = results(Seq(Checks.Satisfies("v_big", col("v") > 5.0)))
    // rows: 10.0 ok, -5.0 viol, 20.0 ok, null -> null predicate -> viol
    r("satisfies(v_big)")._1 shouldBe 2L
  }

  test("uniqueness counts every row of a duplicated key") {
    results(Seq(Checks.Unique(Seq("id"))))("unique(id)")._1 shouldBe 2L
  }

  test("uniqueness exempts null keys (SQL UNIQUE semantics, no double-report with not_null)") {
    // name: "a","b",null,"c" + one more null — nulls never duplicate
    // each other, so only NotNull reports them
    val withNulls = df.unionByName(
      Seq((9L, Option.empty[Double], Option.empty[String])).toDF("id", "v", "name"))
    val r = Checks.run(withNulls,
        Seq(Checks.Unique(Seq("name")), Checks.NotNull("name")))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r("unique(name)") shouldBe 0L
    r("not_null(name)") shouldBe 2L
  }

  test("referential integrity: unresolved foreign keys counted, null FKs exempt") {
    val ref = Seq(1L, 3L).toDF("k")
    val fk = Seq(Some(1L), Some(2L), Some(2L), None).toDF("fid")
      .withColumn("x", lit(1))
    val r = Checks.run(fk, Seq(Checks.RefersTo(Seq("fid"), ref, Seq("k"))))
      .collect().head
    r.getLong(1) shouldBe 2L // the two fid=2 rows; null exempt
  }

  test("all row-level checks share one scan (plan pin on the shared aggregate)") {
    val checks = Seq(
      Checks.NotNull("name"), Checks.NotNull("v"),
      Checks.InRange("v", 0.0, 100.0),
      Checks.Satisfies("p", col("id") > 0))
    // rowLevelAgg IS the pass run() consumes — pin its plan: one scan,
    // one aggregate pair, no join, regardless of check count
    val plan = Checks.rowLevelAgg(df, checks).queryExecution.executedPlan.toString
    "LocalTableScan|FileScan".r.findAllIn(plan).length shouldBe 1
    plan should not include "Join"
    // and its single row answers every check
    val row = Checks.rowLevelAgg(df, checks).head
    row.getLong(0) shouldBe 4L                      // count(*)
    row.getLong(row.fieldIndex("not_null(name)")) shouldBe 1L
    row.getLong(row.fieldIndex("in_range(v,0.0,100.0)")) shouldBe 1L
  }

  test("empty table: zero violations over zero rows, not an NPE") {
    val empty = df.filter(col("id") < 0)
    val r = Checks.run(empty, Seq(
        Checks.NotNull("name"), Checks.InRange("v", 0.0, 1.0),
        Checks.Unique(Seq("id"))))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    r.values.foreach(_ shouldBe ((0L, 0L)))
    r.size shouldBe 3
  }

  test("refers_to rejects mismatched probe/referenced column counts") {
    val ref = Seq(1L).toDF("x").withColumn("y", lit(2L))
    intercept[IllegalArgumentException] {
      Checks.RefersTo(Seq("fid"), ref, Seq("x", "y"))
    }
  }

  test("clean table reports zero violations everywhere") {
    val clean = Seq((1L, 1.0, "x"), (2L, 2.0, "y")).toDF("id", "v", "name")
    Checks.run(clean, Seq(
        Checks.Unique(Seq("id")), Checks.NotNull("name"),
        Checks.InRange("v", 0.0, 10.0)))
      .select("n_violations").as[Long].collect().sum shouldBe 0L
  }
}
