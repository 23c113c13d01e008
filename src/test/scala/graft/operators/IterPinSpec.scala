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
}
