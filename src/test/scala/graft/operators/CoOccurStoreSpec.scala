package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The stored co-occurrence graph: serve equals the direct
  * whole-corpus computation, appends advance O(new + affected
  * groups), and — the case the MergePiece exists for — pairs whose
  * two members arrive in DIFFERENT generations of the same group are
  * counted exactly once.
  */
class CoOccurStoreSpec extends SparkSpec {
  import spark.implicits._

  private def direct(df: org.apache.spark.sql.DataFrame,
      minCount: Long): org.apache.spark.sql.DataFrame =
    graft.dedup.PairGen.pairsWithin(
        df.select(col("g"), col("i")).distinct(), Seq("g"), col("i"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount).select("a", "b")

  private def newCorpus(tag: String): String =
    Files.createTempDirectory(s"graft-cooc-$tag").toString

  test("serve equals the direct computation; repeat serve is stable") {
    val sf = newCorpus("base")
    Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L), (3L, 13L), (4L, 13L))
      .toDF("g", "i").coalesce(1).write.parquet(s"$sf/baskets.parquet")
    val stored = CoOccurStore.edges(spark, sf, "baskets", "g", "i", 2L)
    assertSameRows(stored,
      direct(spark.read.parquet(s"$sf/baskets.parquet"), 2L))
    assertSameRows(CoOccurStore.edges(spark, sf, "baskets", "g", "i", 2L),
      stored)
  }

  test("a pair split across generations of the same group counts once") {
    val sf = newCorpus("xgen")
    // gen 1: group 7 holds item 1 only — no pairs exist yet
    Seq((7L, 1L), (8L, 1L), (8L, 2L)).toDF("g", "i")
      .coalesce(1).write.parquet(s"$sf/baskets.parquet")
    CoOccurStore.edges(spark, sf, "baskets", "g", "i", 1L).count() shouldBe 1
    // gen 2: item 2 joins group 7 — the (1,2) pair now co-occurs in
    // BOTH groups; an additive per-generation design would miss the
    // group-7 instance entirely (its members live in different gens)
    Seq((7L, 2L)).toDF("g", "i")
      .coalesce(1).write.mode("append").parquet(s"$sf/baskets.parquet")
    val got = CoOccurStore.edges(spark, sf, "baskets", "g", "i", 2L)
    got.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((1L, 2L))
    // and a duplicate (g,i) row appended later never inflates counts
    Seq((7L, 2L), (8L, 1L)).toDF("g", "i")
      .coalesce(1).write.mode("append").parquet(s"$sf/baskets.parquet")
    assertSameRows(CoOccurStore.edges(spark, sf, "baskets", "g", "i", 1L),
      direct(spark.read.parquet(s"$sf/baskets.parquet"), 1L))
  }

  test("edge counts invariant under generation chunking") {
    for (seed <- Seq(5, 31); chunks <- Seq(1, 4)) {
      val rnd = new scala.util.Random(seed)
      // rows shuffled so groups STRADDLE chunk boundaries routinely
      val rows = rnd.shuffle(for {
        g <- 1L to 12L
        _ <- 1 to (2 + rnd.nextInt(5))
      } yield (g, rnd.nextInt(9).toLong))
      val sf = newCorpus(s"chunk-$seed-$chunks")
      val corpus = s"$sf/baskets.parquet"
      val per = (rows.size + chunks - 1) / chunks
      rows.grouped(per).zipWithIndex.foreach { case (grp, gi) =>
        grp.toDF("g", "i").coalesce(1)
          .write.mode(if (gi == 0) "overwrite" else "append").parquet(corpus)
        // serve between appends so each chunk lands as its own advance
        CoOccurStore.edges(spark, sf, "baskets", "g", "i", 1L).count()
      }
      withClue(s"seed=$seed chunks=$chunks: ") {
        assertSameRows(
          CoOccurStore.edges(spark, sf, "baskets", "g", "i", 2L),
          direct(spark.read.parquet(corpus), 2L))
      }
    }
  }

  test("retracting the appended generation rolls the counts back") {
    val sf = newCorpus("retract")
    val corpus = s"$sf/baskets.parquet"
    Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)).toDF("g", "i")
      .coalesce(1).write.parquet(corpus)
    CoOccurStore.edges(spark, sf, "baskets", "g", "i", 2L).count() shouldBe 1
    def files() = {
      val s = Files.list(java.nio.file.Paths.get(corpus))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter { f =>
          val n = f.getFileName.toString
          !(n.startsWith("_") || n.startsWith("."))
        }.toSet
      } finally s.close()
    }
    val before = files()
    Seq((3L, 10L), (3L, 11L)).toDF("g", "i")
      .coalesce(1).write.mode("append").parquet(corpus)
    val stored = CoOccurStore.edges(spark, sf, "baskets", "g", "i", 3L)
    stored.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((10L, 11L))
    // drop the appended batch: LWW resolves back to the pre-increment
    // count of 2 — below the 3-cut
    (files() -- before).foreach(Files.delete)
    CoOccurStore.edges(spark, sf, "baskets", "g", "i", 3L).count() shouldBe 0
    CoOccurStore.edges(spark, sf, "baskets", "g", "i", 2L).count() shouldBe 1
  }

  test("a fully-folded warm serve has no aggregate exchange over the edge artifact") {
    val sf = newCorpus("foldskip")
    val corpus = s"$sf/baskets.parquet"
    Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L))
      .toDF("g", "i").coalesce(1).write.parquet(corpus)
    // first build is a rebuild: base only, no delta generations — the
    // serve plan must be scan + filter, no fold-at-read aggregation
    val builtPlan = CoOccurStore.weightedEdges(spark, sf, "baskets", "g", "i", 1L)
      .queryExecution.executedPlan.toString
    withClue(s"freshly-built plan: $builtPlan")(
      builtPlan should not include "HashAggregate")

    // live delta generations DO need the sum (partials per gen)
    Seq((3L, 10L), (3L, 11L)).toDF("g", "i")
      .coalesce(1).write.mode("append").parquet(corpus)
    val unfolded = CoOccurStore.weightedEdges(spark, sf, "baskets", "g", "i", 1L)
    unfolded.queryExecution.executedPlan.toString should
      include("HashAggregate")
    val want = unfolded.collect().map(_.toString).sorted.toSeq

    // after the fold the base is key-unique again: aggregation-free
    // warm serve, identical answer
    CoOccurStore.compact(spark, corpus, "g", "i")
    val folded = CoOccurStore.weightedEdges(spark, sf, "baskets", "g", "i", 1L)
    val foldedPlan = folded.queryExecution.executedPlan.toString
    withClue(s"folded warm-serve plan: $foldedPlan") {
      foldedPlan should not include "HashAggregate"
      foldedPlan should not include "Exchange hashpartitioning"
    }
    folded.collect().map(_.toString).sorted.toSeq shouldBe want
  }

  test("retracting a NON-LATEST generation never serves phantom edges (suffix-only rollback)") {
    // the r12 advisory scenario: group 7 holds {x}; gen 1 adds y,
    // gen 2 adds z. Gen 2's delta partial was computed against
    // base + gen 1, so it encodes (y,z) — dropping gen 1 alone while
    // keeping gen 2 would keep serving a (y,z) edge of a corpus that
    // no longer contains y. The suffix-only rollback rule must route
    // this retract through the full rebuild instead.
    val sf = newCorpus("midretract")
    val corpus = s"$sf/baskets.parquet"
    val x = 1L; val y = 2L; val z = 3L
    def files() = {
      val s = Files.list(java.nio.file.Paths.get(corpus))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter { f =>
          val n = f.getFileName.toString
          !(n.startsWith("_") || n.startsWith("."))
        }.toSet
      } finally s.close()
    }
    Seq((7L, x)).toDF("g", "i").coalesce(1).write.parquet(corpus)
    CoOccurStore.edges(spark, sf, "baskets", "g", "i", 1L).count() shouldBe 0
    val base = files()
    Seq((7L, y)).toDF("g", "i")
      .coalesce(1).write.mode("append").parquet(corpus)
    CoOccurStore.edges(spark, sf, "baskets", "g", "i", 1L).count() shouldBe 1
    val gen1 = files() -- base
    Seq((7L, z)).toDF("g", "i")
      .coalesce(1).write.mode("append").parquet(corpus)
    // full triangle while everything is live
    CoOccurStore.edges(spark, sf, "baskets", "g", "i", 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Set((x, y), (x, z), (y, z))

    // retract gen 1 ONLY (gen 2 stays): the corpus is {x, z}
    gen1.foreach(Files.delete)
    val got = CoOccurStore.edges(spark, sf, "baskets", "g", "i", 1L)
    got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Set((x, z)) // no phantom (y,z), no phantom (x,y)
    assertSameRows(got, direct(spark.read.parquet(corpus), 1L))
  }
}
