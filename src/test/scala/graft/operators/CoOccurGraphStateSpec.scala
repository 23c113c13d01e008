package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The stored graph-state family (round 13): coreness and community
  * labels served from incrementally-advanced merge pieces of the
  * co-occurrence artifact. Every serve must equal the direct
  * whole-graph computation — through initial build, localized appends
  * (the affected-subgraph incremental path), threshold-crossing
  * appends, no-op appends, and the capped fallback (forced by
  * shrinking `graft.cooccur.graphIncCap`).
  */
class CoOccurGraphStateSpec extends SparkSpec {
  import spark.implicits._

  private def newCorpus(tag: String): String =
    Files.createTempDirectory(s"graft-gstate-$tag").toString

  private def directEdges(df: DataFrame): DataFrame =
    graft.dedup.PairGen.pairsWithin(
        df.select(col("g"), col("i")).distinct(), Seq("g"), col("i"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .where(col("n") >= CoOccurStore.GraphMinCount).select("a", "b")

  private def directCore(df: DataFrame): DataFrame =
    KCore.core(directEdges(df), CoOccurStore.CoreK, maxRounds = 64)

  private def directLpa(df: DataFrame): DataFrame = {
    val e = directEdges(df)
    LabelPropagation.labels(
      e.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(e.select(col("b").as("src"), col("a").as("dst"))),
      CoOccurStore.LpaRounds)
  }

  /** A small deterministic basket corpus with real core structure: a
    * clique over items 0..4 (every pair co-occurs in 2 groups — a
    * 3-core), plus a pendant path 5-6 that never reaches core degree.
    */
  private def seedRows: Seq[(Long, Long)] = {
    // groups 0 and 100 each hold items 0..4: every clique pair
    // co-occurs twice (>= cut), degrees 4 — a 3-core
    val cliqueGroups = Seq(0L, 100L).flatMap(g => (0L to 4L).map(i => (g, i)))
    val pendant = Seq((200L, 4L), (200L, 5L), (201L, 4L), (201L, 5L),
      (202L, 5L), (202L, 6L), (203L, 5L), (203L, 6L))
    cliqueGroups ++ pendant
  }

  private def check(sf: String, corpusDf: DataFrame): Unit = {
    assertSameRows(
      CoOccurStore.coreness(spark, sf, "baskets", "g", "i"),
      directCore(corpusDf))
    assertSameRows(
      CoOccurStore.communities(spark, sf, "baskets", "g", "i"),
      directLpa(corpusDf))
  }

  test("initial build serves the direct coreness and labels; a repeat serve is stable") {
    val sf = newCorpus("build")
    seedRows.toDF("g", "i").coalesce(1).write.parquet(s"$sf/baskets.parquet")
    val corpus = spark.read.parquet(s"$sf/baskets.parquet")
    check(sf, corpus)
    check(sf, corpus) // warm serve, no catch-up pending
  }

  test("localized appends advance the stored state exactly (incremental path)") {
    val sf = newCorpus("inc")
    val path = s"$sf/baskets.parquet"
    seedRows.toDF("g", "i").coalesce(1).write.parquet(path)
    check(sf, spark.read.parquet(path))

    // append that pulls item 7 into the core's neighborhood twice —
    // the (5,6,7) triangle doubled makes new edges cross the cut and
    // changes labels near the pendant
    Seq((300L, 5L), (300L, 6L), (300L, 7L), (301L, 5L), (301L, 6L),
      (301L, 7L)).toDF("g", "i")
      .coalesce(1).write.mode("append").parquet(path)
    check(sf, spark.read.parquet(path))

    // append with NO new edges at the cut (a fresh group with one
    // item): graph state unchanged, advance writes an empty delta
    Seq((400L, 9L)).toDF("g", "i")
      .coalesce(1).write.mode("append").parquet(path)
    check(sf, spark.read.parquet(path))

    // append that joins new nodes INTO the 3-core: items 10..12
    // pairwise co-occur twice with each other and with 0, forming
    // new core members attached to the old core
    val joiners = for {
      g <- Seq(500L, 501L)
      i <- Seq(0L, 10L, 11L, 12L)
    } yield (g, i)
    joiners.toDF("g", "i").coalesce(1).write.mode("append").parquet(path)
    check(sf, spark.read.parquet(path))
  }

  test("the capped fallback path stays exact (forced tiny cap)") {
    System.setProperty("graft.cooccur.graphIncCap", "2")
    try {
      val sf = newCorpus("fallback")
      val path = s"$sf/baskets.parquet"
      seedRows.toDF("g", "i").coalesce(1).write.parquet(path)
      check(sf, spark.read.parquet(path))
      Seq((300L, 5L), (300L, 6L), (300L, 7L), (301L, 5L), (301L, 6L),
        (301L, 7L)).toDF("g", "i")
        .coalesce(1).write.mode("append").parquet(path)
      check(sf, spark.read.parquet(path))
    } finally System.clearProperty("graft.cooccur.graphIncCap")
  }

  test("graph state invariant under generation chunking (randomized)") {
    for (seed <- Seq(11, 47); chunks <- Seq(1, 3)) {
      val rnd = new scala.util.Random(seed)
      val rows = rnd.shuffle(for {
        g <- 1L to 30L
        _ <- 1 to (2 + rnd.nextInt(4))
      } yield (g, rnd.nextInt(12).toLong))
      val sf = newCorpus(s"chunk-$seed-$chunks")
      val path = s"$sf/baskets.parquet"
      val per = (rows.size + chunks - 1) / chunks
      rows.grouped(per).zipWithIndex.foreach { case (grp, gi) =>
        grp.toDF("g", "i").coalesce(1)
          .write.mode(if (gi == 0) "overwrite" else "append").parquet(path)
        // serve both pieces between appends so each chunk advances
        CoOccurStore.coreness(spark, sf, "baskets", "g", "i").count()
        CoOccurStore.communities(spark, sf, "baskets", "g", "i").count()
      }
      withClue(s"seed=$seed chunks=$chunks: ")(
        check(sf, spark.read.parquet(path)))
    }
  }
}
