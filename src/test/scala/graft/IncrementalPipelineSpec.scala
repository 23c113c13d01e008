package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan pin for the incremental composed pipeline (p2): the corpus
  * parquet is scanned exactly ONCE — at kept-set materialization —
  * and the incremental path (new-window filter, in-batch
  * first-arrival dedup, anti-join against the seen fingerprints)
  * runs entirely over the checkpointed kept-set. At production scale
  * `seen` is a stored digest table (d8's discipline), so the
  * increment's cost is O(new window + |seen digests|), never
  * O(corpus text): this spec pins the plan shape that keeps that
  * true — no stage re-reads the source files.
  */
class IncrementalPipelineSpec extends SparkSpec {

  test("p2's post-checkpoint plan reads no files — one corpus scan total") {
    val df = SparkEntry.queries("p2_incremental_pipeline")(spark, "/root/testdata/sf0.001")
    df.collect() // execute so AQE finalizes the plan
    val fileScans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(fileScans.isEmpty,
      s"expected no file scans after the checkpointed kept-set, got: " +
        fileScans.map(_.tableIdentifier.toString).mkString(", "))
    assert(df.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "expected the increment to read the checkpointed kept-set")
  }

  test("p2 emits only new-window, first-arrival, never-seen docs") {
    val df = SparkEntry.queries("p2_incremental_pipeline")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // increment only: every survivor is from the new window
    rows.foreach(r => assert(r.getAs[Long]("doc_id") >= 250L))
    // in-batch dedup held: one survivor per fingerprint
    rows.map(_.getAs[String]("fp")).distinct.length shouldBe rows.length
    // vs-seen dedup held: no survivor's fingerprint exists in the
    // seen set as p2 defines it (funnel-kept docs below the cut)
    import org.apache.spark.sql.functions.col
    import graft.core.Tables
    import graft.functions.{QualityFunnel, TextFunctions}
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val seen = QualityFunnel.kept(d, QualityFunnel.defaultRules(col("text")))
      .filter("doc_id < 250")
      .select(TextFunctions.fingerprint(TextFunctions.normalize(col("text"))))
      .collect().map(_.getString(0)).toSet
    rows.foreach(r => assert(!seen.contains(r.getAs[String]("fp")),
      s"doc ${r.getAs[Long]("doc_id")} duplicates a seen fingerprint"))
  }
}
