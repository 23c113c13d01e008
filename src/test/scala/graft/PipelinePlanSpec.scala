package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan pin for the composed p1_pipeline: the corpus parquet is
  * scanned exactly ONCE per execution — at kept-set materialization
  * (the funnel filter rides that single scan; localCheckpoint holds
  * the stage output) — and every later stage (span-dedup pass, rebuild
  * join, exact-dedup window, token stats) reads the checkpointed
  * kept-set, never the file again. A regression that drops the
  * checkpoint (or adds a stage reading the source directly) puts a
  * second FileSourceScan into the final plan and fails here.
  */
class PipelinePlanSpec extends SparkSpec {

  test("p1_pipeline's post-checkpoint plan reads no files — one corpus scan total") {
    val df = SparkEntry.queries("p1_pipeline")(spark, "/root/testdata/sf0.001")
    df.collect() // execute so AQE finalizes the plan
    val fileScans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    // the composed plan's only corpus read happened in the checkpoint
    // job; the executed pipeline plan itself touches zero files
    assert(fileScans.isEmpty,
      s"expected no file scans after the checkpointed kept-set, got: " +
        fileScans.map(_.tableIdentifier.toString).mkString(", "))
    // and the checkpointed stage feeds it (an ExistingRDD scan)
    assert(df.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "expected the pipeline to read the checkpointed kept-set")
  }

  test("p1_pipeline output is internally consistent") {
    val df = SparkEntry.queries("p1_pipeline")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // survivors carry distinct content fingerprints (exact dedup held)
    rows.map(_.getAs[String]("fp")).distinct.length shouldBe rows.length
    // cut_tokens never exceeds the original token count
    rows.foreach { r =>
      r.getAs[Long]("cut_tokens") should be >= 0L
    }
  }
}
