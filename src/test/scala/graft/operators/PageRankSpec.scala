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
}
