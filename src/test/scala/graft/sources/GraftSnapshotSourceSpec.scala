package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DSv2 `graft-snapshot` format: pinned-pointer reads, parquet
  * pushdown through the delegate scan, time travel, and the
  * versioned-commit write path.
  */
class GraftSnapshotSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("store").toString

  test("format reads the live snapshot and pins it against later commits") {
    val path = tmp("snapv2")
    val io = new ParquetTableIO(path)
    io.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "val"))

    val pinned = spark.read.format("graft-snapshot").load(path)
    pinned.orderBy("id").as[(Long, String)].collect() shouldBe
      Array((1L, "a"), (2L, "b"))

    // a commit after the DataFrame was defined must not change what it
    // reads (the previous version survives one commit as the grace
    // window); a FRESH read sees the new snapshot
    io.overwrite(Seq((3L, "c")).toDF("id", "val"))
    pinned.orderBy("id").as[(Long, String)].collect() shouldBe
      Array((1L, "a"), (2L, "b"))
    spark.read.format("graft-snapshot").load(path)
      .as[(Long, String)].collect() shouldBe Array((3L, "c"))
  }

  test("option(version) time-travels within the retention window") {
    val path = tmp("snapv2")
    val io = new ParquetTableIO(path)
    io.overwrite(Seq((1L, "v1")).toDF("id", "val"))
    io.overwrite(Seq((2L, "v2")).toDF("id", "val"))

    spark.read.format("graft-snapshot").option("version", 1).load(path)
      .as[(Long, String)].collect() shouldBe Array((1L, "v1"))
    spark.read.format("graft-snapshot").option("version", 2).load(path)
      .as[(Long, String)].collect() shouldBe Array((2L, "v2"))
    val miss = intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot").option("version", 9).load(path)
    }
    miss.getMessage should include("version 9 not present")
  }

  test("filters and projection push through to the parquet scan") {
    val path = tmp("snapv2")
    new ParquetTableIO(path).overwrite(
      (1L to 100L).map(i => (i, s"name$i", i * 2.0)).toDF("id", "name", "score"))

    val q = spark.read.format("graft-snapshot").load(path)
      .filter($"id" > 90L).select("name")
    val plan = q.queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]")
    // the filter column rides along; the untouched `score` is pruned
    plan should include("ReadSchema: struct<id:bigint,name:string>")
    q.count() shouldBe 10L
  }

  test("overwrite write publishes a new version via the pointer commit") {
    val path = tmp("snapv2")
    val io = new ParquetTableIO(path)
    io.overwrite(Seq((1L, "old")).toDF("id", "val"))
    val before = spark.read.format("graft-snapshot").load(path)

    Seq((2L, "new"), (3L, "new")).toDF("id", "val")
      .write.format("graft-snapshot").mode("overwrite").save(path)

    // fresh read = new snapshot; pre-write DataFrame still the old one
    spark.read.format("graft-snapshot").load(path)
      .orderBy("id").as[(Long, String)].collect() shouldBe
      Array((2L, "new"), (3L, "new"))
    before.as[(Long, String)].collect() shouldBe Array((1L, "old"))
    // the store layout stayed a versioned pointer store
    Files.readString(Paths.get(path).resolve("_current")).trim should
      startWith("v-000000002")
  }

  test("append mode is refused with guidance") {
    val path = tmp("snapv2")
    new ParquetTableIO(path).overwrite(Seq((1L, "a")).toDF("id", "val"))
    val e = intercept[Exception] {
      Seq((2L, "b")).toDF("id", "val")
        .write.format("graft-snapshot").mode("append").save(path)
    }
    e.getMessage should include("append is not supported")
  }

  test("reading an unpublished store names the bootstrap path") {
    val e = intercept[IllegalStateException] {
      spark.read.format("graft-snapshot").load(tmp("snapv2"))
    }
    e.getMessage should include("no published snapshot")
  }

  test("SQL: CREATE TABLE USING graft-snapshot, filtered SELECT") {
    val path = tmp("snapv2")
    new ParquetTableIO(path).overwrite(
      (1L to 50L).map(i => (i, i % 5)).toDF("id", "grp"))
    spark.sql("DROP TABLE IF EXISTS snap_sql_t")
    spark.sql(
      s"CREATE TABLE snap_sql_t USING `graft-snapshot` OPTIONS (path '$path')")
    try {
      spark.sql("SELECT count(*) AS n FROM snap_sql_t WHERE grp = 0")
        .as[Long].head() shouldBe 10L
    } finally spark.sql("DROP TABLE snap_sql_t")
  }
}
