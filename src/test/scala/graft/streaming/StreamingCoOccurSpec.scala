package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming co-occurrence ingest through the BATCH ARTIFACT: every
  * micro-batch lands as a corpus generation and the store's own
  * advance/fold/lease/rollback plane maintains the counts. The specs
  * pin: stream ≡ batch over everything ingested (cross-batch pairs
  * counted once), replay idempotence — including ACROSS A FOLD, the
  * round-13 verdict's done-criterion — crash-partial landings, and
  * the stored graph state (coreness / communities) serving over a
  * streamed corpus exactly as over a batch one.
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
    // serving an un-ingested sink refuses with the actual cause
    val ex = intercept[IllegalStateException] {
      StreamingCoOccur.weightedEdges(spark, s"$out/nowhere", 1L)
    }
    ex.getMessage should include("no ingested")
  }

  test("a replayed micro-batch lands nothing new: counts never inflate") {
    val out = Files.createTempDirectory("graft-stream-cooc-replay").toString
    val b0 = Seq((1L, 10L), (1L, 11L)).toDF("g", "i")
    StreamingCoOccur.applyBatch(b0, 0L, "g", "i", s"$out/cooc")
    val b1 = Seq((1L, 12L), (2L, 10L), (2L, 11L)).toDF("g", "i")
    StreamingCoOccur.applyBatch(b1, 1L, "g", "i", s"$out/cooc")
    val want = StreamingCoOccur.weightedEdges(spark, s"$out/cooc", 1L)
      .collect().map(_.toString).sorted.toSeq
    // at-least-once delivery: batch 1 replays after a crash — the
    // landing re-stages and finds every deterministic corpus name
    // already present, so the corpus (and the artifact) are untouched
    StreamingCoOccur.applyBatch(b1, 1L, "g", "i", s"$out/cooc")
    StreamingCoOccur.weightedEdges(spark, s"$out/cooc", 1L)
      .collect().map(_.toString).sorted.toSeq shouldBe want
    assertSameRows(
      StreamingCoOccur.weightedEdges(spark, s"$out/cooc", 1L),
      direct(Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L))
        .toDF("g", "i"), 1L))
  }

  test("replay is idempotent ACROSS A FOLD: a compacted sink absorbs a replayed batch as a no-op") {
    val out = Files.createTempDirectory("graft-stream-cooc-fold").toString
    val sink = s"$out/cooc"
    val batches = Seq(
      Seq((1L, 10L), (1L, 11L), (2L, 10L)),
      Seq((2L, 11L), (3L, 10L), (3L, 11L)),
      Seq((1L, 12L), (3L, 12L)))
    batches.zipWithIndex.foreach { case (rows, id) =>
      StreamingCoOccur.applyBatch(rows.toDF("g", "i"), id.toLong,
        "g", "i", sink)
    }
    val allRows = batches.flatten.toDF("g", "i")
    val want = StreamingCoOccur.weightedEdges(spark, sink, 1L)
      .collect().map(_.toString).sorted.toSeq
    // fold: partials collapse into the g-/a-clustered bases
    StreamingCoOccur.compact(spark, sink)
    StreamingCoOccur.weightedEdges(spark, sink, 1L)
      .collect().map(_.toString).sorted.toSeq shouldBe want
    // the LAST batch replays after the fold (the only batch
    // at-least-once can redeliver): the corpus names exist, nothing
    // lands, the folded artifact is untouched
    StreamingCoOccur.applyBatch(batches.last.toDF("g", "i"), 2L,
      "g", "i", sink)
    StreamingCoOccur.weightedEdges(spark, sink, 1L)
      .collect().map(_.toString).sorted.toSeq shouldBe want
    assertSameRows(
      StreamingCoOccur.weightedEdges(spark, sink, 1L),
      direct(allRows, 1L))
  }

  test("a crash mid-landing leaves a prefix generation; the replay completes it exactly") {
    val out = Files.createTempDirectory("graft-stream-cooc-crash").toString
    val sink = s"$out/cooc"
    StreamingCoOccur.applyBatch(
      Seq((1L, 10L), (2L, 10L)).toDF("g", "i"), 0L, "g", "i", sink)
    // batch 1 in TWO parts; the writer dies after renaming ONE part,
    // and (worse) the artifact reconciles the half-landed batch — a
    // prefix generation, which the cross-generation delta algebra
    // must absorb exactly
    val b1 = Seq((1L, 11L), (2L, 11L), (3L, 10L), (3L, 11L))
    StreamingCoOccur.landBatch(b1.toDF("g", "i"), 1L, "g", "i", sink,
      parts = 2, keepParts = 1)
    graft.operators.CoOccurStore.ingestTick(spark, s"$sink/corpus", "g", "i")
    // replay of the full batch: re-stages, lands ONLY the missing
    // part (same deterministic name/content), ticks again
    StreamingCoOccur.applyBatch(b1.toDF("g", "i"), 1L, "g", "i", sink,
      parts = 2)
    assertSameRows(
      StreamingCoOccur.weightedEdges(spark, sink, 1L),
      direct((Seq((1L, 10L), (2L, 10L)) ++ b1).toDF("g", "i"), 1L))
  }

  test("a replay with a DIFFERENT parts split refuses loudly instead of losing or doubling rows") {
    val out = Files.createTempDirectory("graft-stream-cooc-parts").toString
    val sink = s"$out/cooc"
    val b = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L))
    StreamingCoOccur.applyBatch(b.toDF("g", "i"), 0L, "g", "i", sink,
      parts = 2)
    val want = StreamingCoOccur.weightedEdges(spark, sink, 1L)
      .collect().map(_.toString).sorted.toSeq
    // parts=1 splits the same rows differently: skip-if-exists would
    // double the rows of the old p-files — the name carries the parts
    // count, so the mismatch is a loud error, not silent corruption
    val ex = intercept[IllegalStateException] {
      StreamingCoOccur.applyBatch(b.toDF("g", "i"), 0L, "g", "i", sink,
        parts = 1)
    }
    ex.getMessage should include("DIFFERENT parts split")
    // the sink is untouched by the refused attempt
    StreamingCoOccur.weightedEdges(spark, sink, 1L)
      .collect().map(_.toString).sorted.toSeq shouldBe want
    // same-parts replay remains a no-op
    StreamingCoOccur.applyBatch(b.toDF("g", "i"), 0L, "g", "i", sink,
      parts = 2)
    StreamingCoOccur.weightedEdges(spark, sink, 1L)
      .collect().map(_.toString).sorted.toSeq shouldBe want
  }

  test("a legacy pre-corpus sink refuses with a migration message instead of silently dropping history") {
    val out = Files.createTempDirectory("graft-stream-cooc-legacy").toString
    val sink = s"$out/cooc"
    Files.createDirectories(java.nio.file.Paths.get(sink, "gi"))
    val ex = intercept[IllegalStateException] {
      StreamingCoOccur.applyBatch(
        Seq((1L, 10L)).toDF("g", "i"), 0L, "g", "i", sink)
    }
    ex.getMessage should include("legacy")
    val ex2 = intercept[IllegalStateException] {
      StreamingCoOccur.weightedEdges(spark, sink, 1L)
    }
    ex2.getMessage should include("legacy")
    // a remote-scheme outDir refuses up front (java.nio landing)
    val ex3 = intercept[IllegalArgumentException] {
      StreamingCoOccur.applyBatch(
        Seq((1L, 10L)).toDF("g", "i"), 0L, "g", "i", "s3a://bucket/x")
    }
    ex3.getMessage should include("local-filesystem")
  }

  test("migrateLegacy replays a pre-corpus sink's history through the real door; serves equal a direct-ingest sink; re-running is a no-op") {
    val root = Files.createTempDirectory("graft-cooc-migrate").toString
    val legacy = s"$root/legacy"
    val fresh = s"$root/fresh"
    val twin = s"$root/twin"
    // three batches in the round-13 layout: gi/_batch=<id> partitions
    // (plus a pairparts dir — presence alone marks the tree legacy)
    val batches = Seq(
      0L -> Seq((7L, 1L), (8L, 1L), (8L, 2L)),
      1L -> Seq((7L, 2L), (7L, 3L), (9L, 5L)),
      2L -> Seq((8L, 2L), (9L, 6L), (7L, 1L))) // dups within history OK
    batches.foreach { case (b, rows) =>
      rows.toDF("g", "i").withColumn("_batch", lit(b))
        .write.mode("append").partitionBy("_batch")
        .parquet(s"$legacy/gi")
    }
    Files.createDirectories(java.nio.file.Paths.get(legacy, "pairparts"))
    // the legacy tree refuses to serve; the message names the tool
    intercept[IllegalStateException] {
      StreamingCoOccur.weightedEdges(spark, legacy, 1L)
    }.getMessage should include("migrateLegacy")
    StreamingCoOccur.migrateLegacy(spark, legacy, fresh)
    // ground truth: the same batches ingested directly
    batches.foreach { case (b, rows) =>
      StreamingCoOccur.applyBatch(rows.toDF("g", "i"), b, "g", "i", twin)
    }
    def edges(dir: String) = StreamingCoOccur
      .weightedEdges(spark, dir, 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def coreness(dir: String) = StreamingCoOccur.coreness(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def communities(dir: String) = StreamingCoOccur.communities(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = edges(fresh)
    e shouldBe edges(twin)
    e should not be empty
    coreness(fresh) shouldBe coreness(twin)
    communities(fresh) shouldBe communities(twin)
    // BOTH migration routes serve identically: the batched default
    // (land all, one catch-up advance) just ran above; the per-batch
    // door (tickEveryBatch) replays one artifact tick per legacy
    // batch — this equivalence is what makes the batched default
    // safe to trust on a 10^4-batch sink
    val perBatch = s"$root/perbatch"
    StreamingCoOccur.migrateLegacy(spark, legacy, perBatch,
      tickEveryBatch = true)
    edges(perBatch) shouldBe e
    coreness(perBatch) shouldBe coreness(twin)
    communities(perBatch) shouldBe communities(twin)
    // idempotent: a re-run (crash recovery) re-lands nothing
    StreamingCoOccur.migrateLegacy(spark, legacy, fresh)
    edges(fresh) shouldBe e
    // the legacy tree was never written to
    spark.read.parquet(s"$legacy/gi").count() shouldBe 9L
    // a sink that already ingested its OWN batches refuses migration
    // (colliding batch ids would silently drop legacy rows under the
    // landing protocol's skip-if-exists rule)
    intercept[IllegalStateException] {
      StreamingCoOccur.migrateLegacy(spark, legacy, twin)
    }.getMessage should include("_migrated_from")
    // and a second migration from a DIFFERENT legacy tree refuses
    val legacy2 = s"$root/legacy2"
    Seq((0L, Seq((1L, 2L)))).foreach { case (b, rows) =>
      rows.toDF("g", "i").withColumn("_batch", lit(b))
        .write.mode("append").partitionBy("_batch")
        .parquet(s"$legacy2/gi")
    }
    intercept[IllegalStateException] {
      StreamingCoOccur.migrateLegacy(spark, legacy2, fresh)
    }.getMessage should include("migrated from")
  }

  test("stampMarkerCreated reports creation exactly once; losers read the winner — the migrate race re-check's foundation") {
    val root = Files.createTempDirectory("graft-stamp-created")
    val p = root.resolve("marker")
    val (w1, c1) = graft.sources.CorpusLanding
      .stampMarkerCreated(p, "alpha")
    (w1, c1) shouldBe ("alpha", true)
    // a second stamp (any content) loses: winner's content, created=false
    val (w2, c2) = graft.sources.CorpusLanding
      .stampMarkerCreated(p, "beta")
    (w2, c2) shouldBe ("alpha", false)
    val (w3, c3) = graft.sources.CorpusLanding
      .stampMarkerCreated(p, "alpha")
    (w3, c3) shouldBe ("alpha", false)
  }

  test("stored graph state serves over a streamed corpus: coreness and communities equal the direct operators") {
    val out = Files.createTempDirectory("graft-stream-cooc-graph").toString
    val sink = s"$out/cooc"
    // K4 on items {1,2,3,4} (every pair in two groups → edge count 2 ≥
    // the registered cut) + a pendant item 5 attached to 1 — so the
    // 3-core is exactly the clique and node 5 is outside it
    val basket = Seq(1L, 2L, 3L, 4L)
    val b0 = basket.map(i => (100L, i)) ++ Seq((102L, 1L), (102L, 5L))
    val b1 = basket.map(i => (101L, i)) ++ Seq((103L, 1L), (103L, 5L))
    StreamingCoOccur.applyBatch(b0.toDF("g", "i"), 0L, "g", "i", sink)
    StreamingCoOccur.applyBatch(b1.toDF("g", "i"), 1L, "g", "i", sink)

    val cut = graft.operators.CoOccurStore.GraphMinCount
    val edges = StreamingCoOccur.weightedEdges(spark, sink, cut)
      .select("a", "b").localCheckpoint()
    edges.count() shouldBe 7 // 6 clique edges + (1,5)

    val gotCore = StreamingCoOccur.coreness(spark, sink)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantCore = graft.operators.KCore.core(edges, k = 3, maxRounds = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    gotCore shouldBe wantCore
    gotCore.map(_._1) shouldBe basket.toSet

    val both = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
    val gotLbl = StreamingCoOccur.communities(spark, sink)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantLbl = graft.operators.LabelPropagation.labels(both, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    gotLbl shouldBe wantLbl

    // the state ADVANCES on further streamed batches: a new clique
    // member (item 6 co-bought with 1,2,3,4 twice) joins the core
    val b2 = Seq(104L, 105L).flatMap(g =>
      (basket :+ 6L).map(i => (g, i)))
    StreamingCoOccur.applyBatch(b2.toDF("g", "i"), 2L, "g", "i", sink)
    val edges2 = StreamingCoOccur.weightedEdges(spark, sink, cut)
      .select("a", "b").localCheckpoint()
    val gotCore2 = StreamingCoOccur.coreness(spark, sink)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantCore2 = graft.operators.KCore.core(edges2, k = 3, maxRounds = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    gotCore2 shouldBe wantCore2
    gotCore2.map(_._1) shouldBe (basket :+ 6L).toSet
  }
}
