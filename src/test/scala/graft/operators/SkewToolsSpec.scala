package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewToolsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 500).map { i =>
    // hot key: "a" owns 80% of rows
    (if (i % 5 == 0) s"k${i % 7}" else "a", i.toLong % 37, i.toLong)
  }.toDF("k", "u", "v")

  test("salted two-phase agg equals the plain aggregation exactly") {
    val salted = SkewTools.saltedAgg(df, Seq("k"), col("u"), 16,
      partial = Seq(count(lit(1)).as("_pc"), count_distinct(col("u")).as("_pu"),
        sum(col("v")).as("_ps"), max(col("v")).as("_pm")),
      merge = Seq(sum(col("_pc")).as("n"), sum(col("_pu")).as("nu"),
        sum(col("_ps")).as("s"), max(col("_pm")).as("m")))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"),
      count_distinct(col("u")).as("nu"), sum(col("v")).as("s"), max(col("v")).as("m"))
    assertSameRows(salted, plain)
  }

  test("salt=1 degenerates to the plain plan's results") {
    val salted = SkewTools.saltedAgg(df, Seq("k"), col("u"), 1,
      partial = Seq(count(lit(1)).as("_pc")), merge = Seq(sum(col("_pc")).as("n")))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"))
    assertSameRows(salted, plain)
  }

  test("deterministic: two executions produce identical results") {
    def run() = SkewTools.saltedAgg(df, Seq("k"), col("u"), 8,
      partial = Seq(count(lit(1)).as("_pc")), merge = Seq(sum(col("_pc")).as("n")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    run() shouldBe run()
  }

  test("fanOut spreads a one-file parquet scan to the session parallelism") {
    val dir = java.nio.file.Files.createTempDirectory("fanout").toString
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    val fanned = SkewTools.fanOut(scan)
    // the gate fires (repartition present) and content is untouched
    assert(fanned.queryExecution.analyzed.toString.contains("Repartition"),
      "single-file scan should be repartitioned")
    fanned.rdd.getNumPartitions shouldBe spark.sparkContext.defaultParallelism
    assertSameRows(fanned, scan)
  }

  test("fanOut leaves non-file inputs untouched (no blind repartition)") {
    val local = df // in-memory relation: zero input files
    val out = SkewTools.fanOut(local)
    assert(out eq local, "in-memory frame must pass through untouched")
  }

  test("fanOut skips large scans that Spark's own byte-splitting parallelizes") {
    val dir = java.nio.file.Files.createTempDirectory("fanout-big").toString
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    // shrink maxPartitionBytes so the (tiny) file *looks* like it splits
    // into >= parallelism pieces on its own — the gate must stand down
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "16")
      val scan = spark.read.parquet(dir)
      val out = SkewTools.fanOut(scan)
      assert(out eq scan, "byte-splittable scan must pass through untouched")
    } finally spark.conf.set(key, prev)
  }
}
