package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class TableIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp: String =
    Files.createTempDirectory("tio").resolve("t").toString

  test("overwrite then read round-trips") {
    val io = new ParquetTableIO(tmp)
    io.exists shouldBe false
    io.overwrite(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    io.exists shouldBe true
    io.read(spark).count() shouldBe 2
  }

  test("new snapshot can be computed FROM the old one (read+overwrite same path)") {
    // Spark's own Overwrite truncates before reading — the staging swap
    // is what makes self-referential snapshots safe.
    val io = new ParquetTableIO(tmp)
    io.overwrite(Seq((1, 10L)).toDF("id", "version"))
    val next = io.read(spark).withColumn("version",
      org.apache.spark.sql.functions.col("version") + 1)
    io.overwrite(next)
    io.read(spark).select("version").as[Long].collect() shouldBe Array(11L)
  }

  test("prepare stages without publishing; abort leaves old data intact") {
    val io = new ParquetTableIO(tmp)
    io.overwrite(Seq((1, "old")).toDF("id", "v"))
    val p = io.prepare(Seq((1, "new")).toDF("id", "v"))
    io.read(spark).select("v").as[String].collect() shouldBe Array("old")
    p.abort()
    io.read(spark).select("v").as[String].collect() shouldBe Array("old")
  }

  test("partitionBy lays out date-partitioned directories (pruning-ready)") {
    val dir = tmp
    val io = new ParquetTableIO(dir, partitionBy = Seq("day"))
    io.overwrite(Seq((1, "2024-01-01"), (2, "2024-01-02")).toDF("id", "day"))
    val days = new java.io.File(dir).list().filter(_.startsWith("day="))
    days.sorted shouldBe Array("day=2024-01-01", "day=2024-01-02")
    // partition filter prunes to one directory
    val one = io.read(spark).filter(org.apache.spark.sql.functions.col("day") === "2024-01-01")
    one.count() shouldBe 1
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && !plan.toLowerCase.contains("pushedfilters: [is"))
  }
}
