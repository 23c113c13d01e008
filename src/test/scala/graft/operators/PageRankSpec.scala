package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("mass conserves (sums to 1) with dangling redistribution") {
    // star + dangling sink: b,c,d -> a; a has no out-edges
    val e = Seq(("b", "a"), ("c", "a"), ("d", "a")).toDF("src", "dst")
    val pr = PageRank.ranks(spark, e, iters = 10)
    val total = pr.agg(sum("pr")).head.getDouble(0)
    total shouldBe 1.0 +- 1e-4 // rounding at 6 dp across 4 nodes
    // the sink holds the most mass
    val ranks = pr.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks("a") > ranks("b"))
    ranks("b") shouldBe ranks("c") // symmetric sources tie exactly
  }

  test("more in-links mean more rank; iteration count changes values") {
    val e = Seq(("x", "hub"), ("y", "hub"), ("z", "hub"),
      ("x", "leaf"), ("hub", "x")).toDF("src", "dst")
    val pr5 = PageRank.ranks(spark, e, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr5("hub") > pr5("leaf"))
    val pr1 = PageRank.ranks(spark, e, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr1("hub") != pr5("hub")) // genuinely iterative
  }

  private def ring(n: Int, from: Int = 0): Seq[(String, String)] =
    (from until n).map(i => (s"n$i", s"n${(i + 1) % n}")) ++
      (from until n).map(i => (s"n$i", s"hub"))

  test("warm start converges to the cold fixpoint in fewer iterations") {
    val g1 = ring(30).toDF("src", "dst")
    val g2 = (ring(30) ++ Seq(("hub", "n0"), ("nX", "hub"), ("nX", "n5")))
      .toDF("src", "dst")
    val tol = 1e-10
    val (cold1, _) = PageRank.converged(spark, g1, None, tol)
    val (cold2, coldIters) = PageRank.converged(spark, g2, None, tol)
    val (warm2, warmIters) =
      PageRank.converged(spark, g2, Some(cold1), tol)
    // same destination (unique fixpoint), fewer rounds from nearby
    val maxDiff = warm2.withColumnRenamed("pr", "w")
      .join(cold2.withColumnRenamed("pr", "c"), "node")
      .agg(max(abs(col("w") - col("c")))).head.getDouble(0)
    assert(maxDiff < 1e-7, s"warm fixpoint drifted: $maxDiff")
    assert(warmIters < coldIters,
      s"warm start did not save rounds: $warmIters vs $coldIters")
  }

  test("unconverged-by-maxIters fails loudly instead of serving ranks") {
    val e = ring(10).toDF("src", "dst")
    an[IllegalStateException] should be thrownBy
      PageRank.converged(spark, e, None, tol = 1e-12, maxIters = 2)
  }
}

/** The stored rank vector: cold build == converged cold run; an edge
  * append warm-starts from the stored vector and lands within
  * tolerance of the cold answer on the grown graph; base snapshots
  * stay untouched by the advance.
  */
class PageRankStoreSpec extends SparkSpec {
  import spark.implicits._

  test("build, warm-start advance on append, rebuild on rewrite") {
    val base = java.nio.file.Files.createTempDirectory("prstore")
    val edges = base.resolve("edges.parquet").toString
    // ring + hub spokes: a pure cycle contracts at d^t (127 rounds to
    // 1e-9) — the dangling hub redistributes mass and mixes fast
    val g1 = (0 until 20).map(i => (s"a$i", s"a${(i + 1) % 20}")) ++
      (0 until 20).map(i => (s"a$i", "hub"))
    g1.toDF("src", "dst").coalesce(1).write.parquet(edges)
    val tol = 1e-9

    val served1 = PageRankStore.ranks(spark, edges, tol)
    assertSameRows(served1,
      PageRank.converged(spark, g1.toDF("src", "dst"), None, tol)._1)

    // append: new spokes into the ring
    val extra = Seq(("b0", "a0"), ("b0", "a7"), ("a3", "b0"))
    extra.toDF("src", "dst").coalesce(1)
      .write.mode("append").parquet(edges)
    val served2 = PageRankStore.ranks(spark, edges, tol)
    val cold2 = PageRank.converged(spark,
      (g1 ++ extra).toDF("src", "dst"), None, tol)._1
    val maxDiff = served2.withColumnRenamed("pr", "w")
      .join(cold2.withColumnRenamed("pr", "c"), "node")
      .agg(max(abs(col("w") - col("c")))).head.getDouble(0)
    assert(maxDiff < 1e-6, s"stored warm ranks drifted: $maxDiff")
    served2.count() shouldBe 22 // every node labelled exactly once

    // in-place rewrite (shrink) keys a full rebuild — stale nodes gone
    Seq(("z1", "z2"), ("z2", "z1")).toDF("src", "dst").coalesce(1)
      .write.mode("overwrite").parquet(edges)
    PageRankStore.ranks(spark, edges, tol)
      .select("node").as[String].collect().toSet shouldBe Set("z1", "z2")
  }
}
