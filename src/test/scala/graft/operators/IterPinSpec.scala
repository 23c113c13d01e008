package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** The reliable-checkpoint knob for the iterative graph family:
  * localCheckpoint blocks are executor-local, so on a real cluster a
  * lost executor mid-loop kills the lineage — the knob writes every
  * N-th pin to the reliable checkpoint dir instead. Results must be
  * identical either way; a knob without a checkpoint dir refuses
  * loudly (a silently-skipped reliable checkpoint would defeat the
  * protection).
  */
class IterPinSpec extends SparkSpec {
  import spark.implicits._

  test("knob without a checkpoint dir refuses loudly; with one, loops run reliably with identical results") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"))
      .toDF("src", "dst")
    val ew = e.withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val eu = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("a", "b")
    val seeds = Seq("a").toDF("node")

    def runAll(): Seq[Seq[String]] = Seq(
      ShortestPath.hops(e, seeds, 5),
      ShortestPath.weighted(ew, seeds, 5),
      KCore.peelRounds(eu, k = 1, rounds = 3),
      LabelPropagation.labels(e, rounds = 2),
      PageRank.ranks(spark, e, iters = 3)
    ).map(_.collect().map(_.toString).sorted.toSeq)

    val baseline = runAll() // knob off: today's localCheckpoint path

    System.setProperty("graft.graph.reliableCheckpointEvery", "2")
    try {
      // no checkpoint dir configured → loud refusal, not a silent skip
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        val ex = intercept[IllegalArgumentException] {
          ShortestPath.hops(e, seeds, 3).collect()
        }
        ex.getMessage should include("checkpoint directory")
      }
      val dir = Files.createTempDirectory("graft-iterpin-ckpt")
      spark.sparkContext.setCheckpointDir(dir.toString)
      runAll() shouldBe baseline
      // proof the reliable path actually engaged: the dir holds RDDs
      val s = Files.walk(dir)
      val files =
        try s.filter(Files.isRegularFile(_)).count()
        finally s.close()
      files should be > 0L
    } finally System.clearProperty("graft.graph.reliableCheckpointEvery")
  }

  test("cut cadence is per logical state stream: every stream of weighted SSSP lands reliable cuts every N of its OWN pins") {
    val ew = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L),
      ("a", "d", 5L)).toDF("src", "dst", "w")
    val seeds = Seq("a").toDF("node")
    val dir = Files.createTempDirectory("graft-iterpin-streams")
    spark.sparkContext.setCheckpointDir(dir.toString)
    System.setProperty("graft.graph.reliableCheckpointEvery", "2")
    val pins = scala.collection.mutable.ArrayBuffer[(String, Int, Boolean)]()
    IterPin.trace = (s, i, r) => pins.synchronized { pins += ((s, i, r)) }
    try {
      ShortestPath.weighted(ew, seeds, 5).collect()
      val byStream = pins.groupBy(_._1)
      // weighted evolves THREE streams; each must follow idx % 2 == 0
      byStream.keySet should contain allOf ("edges", "dist", "imp")
      byStream.foreach { case (_, ps) =>
        ps.foreach { case (_, i, reliable) => reliable shouldBe (i % 2 == 0) }
        ps.map(_._2).sorted shouldBe (0 until ps.size)
      }
      // the advisory's failing case: dist advances past its initial
      // pin, so with an even N it MUST still land a later reliable cut
      // (the old shared index parked dist on odd slots forever)
      val dist = byStream("dist")
      dist.size should be > 2
      dist.count { case (_, i, r) => r && i > 0 } should be > 0
    } finally {
      IterPin.trace = null
      System.clearProperty("graft.graph.reliableCheckpointEvery")
    }
  }
}
