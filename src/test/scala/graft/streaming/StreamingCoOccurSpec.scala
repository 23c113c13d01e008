package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming co-occurrence ingest: micro-batches land pair-count
  * delta partials; the running sum equals the batch computation over
  * everything ingested — including pairs whose two members arrive in
  * DIFFERENT micro-batches — and a replayed batch is idempotent.
  */
class StreamingCoOccurSpec extends SparkSpec {
  import spark.implicits._

  private def direct(df: org.apache.spark.sql.DataFrame,
      minCount: Long): org.apache.spark.sql.DataFrame =
    graft.dedup.PairGen.pairsWithin(
        df.select(col("g"), col("i")).distinct(), Seq("g"), col("i"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)

  test("stream equals batch across micro-batches; cross-batch pairs counted once") {
    val out = Files.createTempDirectory("graft-stream-cooc").toString
    val ckpt = Files.createTempDirectory("graft-stream-cooc-ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingCoOccur.start(
      mem.toDF().toDF("g", "i"), "g", "i", s"$out/cooc", ckpt,
      Trigger.ProcessingTime(0))

    // batch 1: group 7 holds {1}; group 8 holds {1,2}
    mem.addData((7L, 1L), (8L, 1L), (8L, 2L))
    q.processAllAvailable()
    // batch 2: item 2 JOINS group 7 — the (1,2) pair of group 7
    // spans micro-batches and must count exactly once; group 9 is a
    // fresh basket
    mem.addData((7L, 2L), (9L, 1L), (9L, 2L))
    q.processAllAvailable()
    q.stop()

    val all = Seq((7L, 1L), (8L, 1L), (8L, 2L), (7L, 2L), (9L, 1L),
      (9L, 2L)).toDF("g", "i")
    assertSameRows(
      StreamingCoOccur.weightedEdges(spark, s"$out/cooc", 1L),
      direct(all, 1L))
    // (1,2) co-occurs in all three groups
    StreamingCoOccur.weightedEdges(spark, s"$out/cooc", 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((1L, 2L))
  }

  test("a replayed micro-batch overwrites itself: counts never inflate") {
    val out = Files.createTempDirectory("graft-stream-cooc-replay").toString
    val b0 = Seq((1L, 10L), (1L, 11L)).toDF("g", "i")
    StreamingCoOccur.applyBatch(b0, 0L, "g", "i", s"$out/cooc")
    val b1 = Seq((1L, 12L), (2L, 10L), (2L, 11L)).toDF("g", "i")
    StreamingCoOccur.applyBatch(b1, 1L, "g", "i", s"$out/cooc")
    val want = StreamingCoOccur.weightedEdges(spark, s"$out/cooc", 1L)
      .collect().map(_.toString).sorted.toSeq
    // at-least-once delivery: batch 1 replays after a crash — the
    // delta recomputes identically (pre-view = _batch < 1) and
    // dynamic overwrite replaces the same partition
    StreamingCoOccur.applyBatch(b1, 1L, "g", "i", s"$out/cooc")
    StreamingCoOccur.weightedEdges(spark, s"$out/cooc", 1L)
      .collect().map(_.toString).sorted.toSeq shouldBe want
    assertSameRows(
      StreamingCoOccur.weightedEdges(spark, s"$out/cooc", 1L),
      direct(Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L))
        .toDF("g", "i"), 1L))
  }
}
