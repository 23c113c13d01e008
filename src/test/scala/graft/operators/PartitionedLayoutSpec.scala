package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("predicate on the partition column prunes directories; values equal the flat scan") {
    val df = (1L to 3000L).map(i => (i % 10, i, s"v$i")).toDF("pk", "id", "v")
    PartitionedLayout.ensurePartitioned(df, "pspec_prune", "pk", "fp1")
    val q = PartitionedLayout.read(spark, "pspec_prune")
      .where(col("pk") === 3 || col("pk") === 7)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    // the filter lands in PartitionFilters (planning-time directory
    // pruning), leaving nothing for the row-level DataFilters
    p should include regex "PartitionFilters: \\[.*pk"
    p should include("DataFilters: []")
    assertSameRows(
      q.select("pk", "id", "v"),
      df.where(col("pk") === 3 || col("pk") === 7))
  }

  test("ensurePartitioned is idempotent per fingerprint and rewrites on change") {
    val df = (1L to 100L).map(i => (i % 4, i)).toDF("pk", "id")
    val loc = PartitionedLayout.ensurePartitioned(df, "pspec_idem", "pk", "fpA")
    import scala.jdk.CollectionConverters._
    def stamp(): Map[String, Long] = {
      val st = Files.walk(Paths.get(loc))
      try st.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
      finally st.close()
    }
    val before = stamp()
    // same fingerprint: nothing rewritten, byte-identical layout
    PartitionedLayout.ensurePartitioned(df, "pspec_idem", "pk", "fpA")
    assert(stamp() === before, "reuse path rewrote layout files")
    // changed fingerprint: the layout rebuilds and serves the new rows
    val df2 = (1L to 50L).map(i => (i % 4, i + 1000)).toDF("pk", "id")
    PartitionedLayout.ensurePartitioned(df2, "pspec_idem", "pk", "fpB")
    assertSameRows(
      PartitionedLayout.read(spark, "pspec_idem").select("pk", "id"), df2)
  }
}
