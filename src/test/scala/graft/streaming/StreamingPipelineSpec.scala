package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed streaming ingest: funnel filter + observed-metrics
  * ledger + within-watermark dedup + stats, one plan.
  */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // simple deterministic rules so the spec controls pass/fail exactly
  private def rules(text: org.apache.spark.sql.Column) = Seq(
    "min_tokens" ->
      (org.apache.spark.sql.functions.size(split(text, " ")) >= 4),
    "no_spam" -> !text.contains("spam"))

  test("funnel drops, ledger metrics, cross-batch dedup, stats in one query") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingPipeline(
      mem.toDS().toDF("doc_id", "ts", "text"),
      "doc_id", "ts", "text", rules, watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("sp_out")
      .outputMode("append").start()

    val good = "the quick brown fox jumps clear"
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), good),
      (2L, ts("2024-01-01 10:05:00"), good), // in-batch duplicate of 1
      (3L, ts("2024-01-01 10:06:00"), "too short"), // fails min_tokens
      (4L, ts("2024-01-01 10:07:00"), "buy spam now cheap deal")) // fails no_spam
    q.processAllAvailable()
    mem.addData(
      (5L, ts("2024-01-01 10:20:00"), good), // cross-batch duplicate of 1
      (6L, ts("2024-01-01 10:25:00"), "a genuinely different document here"))
    q.processAllAvailable()

    val rows = spark.table("sp_out")
      .select("doc_id", "n_tokens").as[(Long, Int)].collect().toMap
    // first arrival wins; dups, short, and spam docs never surface
    rows.keySet shouldBe Set(1L, 6L)
    rows(1L) shouldBe 6
    rows(6L) shouldBe 5

    // the funnel ledger rode the stream as observed metrics — batch 1:
    // 4 docs total, 1 dropped at min_tokens, 1 at no_spam (first-fail
    // attribution, so the spam doc counts at its first failed rule)
    val ledgers = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("quality_funnel")))
      .map(r => (r.getAs[Long]("total"),
        r.getAs[Long]("dropped_min_tokens"), r.getAs[Long]("dropped_no_spam")))
    ledgers should contain((4L, 1L, 1L)) // batch 1
    ledgers should contain((2L, 0L, 0L)) // batch 2: both pass the funnel
    q.stop()
  }

  test("null text is funnel-dropped, not crashed, and attributed to rule 1") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingPipeline(
      mem.toDS().toDF("doc_id", "ts", "text")
        .withColumn("text", when(col("doc_id") === 99L, lit(null)).otherwise(col("text"))),
      "doc_id", "ts", "text", rules, watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("sp_null_out")
      .outputMode("append").start()

    mem.addData(
      (99L, ts("2024-01-01 10:00:00"), "placeholder"),
      (7L, ts("2024-01-01 10:01:00"), "the quick brown fox jumps clear"))
    q.processAllAvailable()

    spark.table("sp_null_out").select("doc_id").as[Long].collect().toSeq shouldBe Seq(7L)
    val ledger = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("quality_funnel"))).head
    ledger.getAs[Long]("dropped_min_tokens") shouldBe 1L // null → failed at stage 1
    q.stop()
  }
}
