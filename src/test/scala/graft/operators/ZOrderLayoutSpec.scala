package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Rows the parquet reader actually RETURNED for a both-dims-narrow
    * predicate — row groups skipped by min/max stats never surface
    * here, so this measures the layout's skipping power directly.
    */
  private def scannedRows(path: String): Long = {
    val q = spark.read.parquet(path)
      .where(col("a").between(100, 120) && col("b").between(5000, 5200))
    q.collect()
    val scan = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    scan.metrics("numOutputRows").value
  }

  test("z-order layout skips most row groups on either-column predicates") {
    val base = Files.createTempDirectory("zorder")
    // two independent uniform dims: a single-column sort can only
    // cluster one of them; the z-curve clusters both
    val df = spark.range(400000)
      .select(col("id"),
        (pmod(hash(col("id")), lit(1000))).as("a"),
        (pmod(hash(col("id") + 7), lit(10000))).as("b"))
    val plain = base.resolve("plain").toString
    val zed = base.resolve("zed").toString
    df.repartition(32).write
      .option("parquet.block.size", (1 << 20).toString).parquet(plain)
    ZOrder.writeZOrdered(df, zed, Seq("a", "b"), bits = 8, numFiles = 32)

    // identical content
    assertSameRows(spark.read.parquet(plain), spark.read.parquet(zed))

    val unordered = scannedRows(plain)
    val zordered = scannedRows(zed)
    withClue(s"unordered=$unordered zordered=$zordered: ") {
      // random layout surfaces ~everything; the z-layout's row groups
      // cover small (a, b) rectangles so most are skipped outright
      zordered.toDouble should be < unordered * 0.3
    }
  }

  test("z-value interleaves buckets monotonically per dimension") {
    val df = Seq((0.0, 0.0), (255.5, 0.0), (0.0, 255.5), (1000.0, 1000.0))
      .toDF("a", "b")
    val big = spark.range(100000)
      .select((col("id") % 1000).cast("double").as("a"),
        (col("id") % 997).cast("double").as("b"))
    val z = ZOrder.zValue(big, Seq("a", "b"), bits = 4)
    val vals = big.select(col("a"), col("b"), z.as("z")).collect()
    // z of the max corner dominates z of the min corner
    val zmin = vals.minBy(r => (r.getDouble(0), r.getDouble(1))).getLong(2)
    val zmax = vals.maxBy(r => (r.getDouble(0), r.getDouble(1))).getLong(2)
    assert(zmin < zmax)
    // all z-values fit in 2 * bits bits
    vals.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) < (1L << 8)))
  }
}
