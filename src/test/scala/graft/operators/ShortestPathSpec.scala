package graft.operators

import graft.SparkSpec

class ShortestPathSpec extends SparkSpec {
  import spark.implicits._

  private def distMap(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
    df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  test("line graph: hop distances, truncation at maxHops") {
    // a -> b -> c -> d -> e
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    distMap(ShortestPath.hops(e, seeds, maxHops = 2)) shouldBe
      Map("a" -> 0, "b" -> 1, "c" -> 2) // d, e beyond the bound: absent
    distMap(ShortestPath.hops(e, seeds, maxHops = 10)) shouldBe
      Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3, "e" -> 4)
  }

  test("multi-source takes the min over seeds; seeds settle at 0") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("z", "c"))
      .toDF("src", "dst")
    val d = distMap(ShortestPath.hops(e, Seq("a", "z").toDF("node"), 10))
    d("c") shouldBe 1 // via z, not 2 via a
    d("a") shouldBe 0
    d("z") shouldBe 0
  }

  test("direction is respected; unreachable nodes are absent") {
    val e = Seq(("a", "b"), ("c", "b")).toDF("src", "dst")
    val d = distMap(ShortestPath.hops(e, Seq("a").toDF("node"), 10))
    d shouldBe Map("a" -> 0, "b" -> 1) // c only points INTO b
  }

  test("isolated seed is reported at distance 0") {
    val e = Seq(("a", "b")).toDF("src", "dst")
    val d = distMap(ShortestPath.hops(e, Seq("lonely").toDF("node"), 5))
    d shouldBe Map("lonely" -> 0)
  }

  test("frontier exhaustion exits early without changing the result") {
    // diameter 2; maxHops 100 must equal maxHops 2 (and terminate)
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    distMap(ShortestPath.hops(e, seeds, 100)) shouldBe
      distMap(ShortestPath.hops(e, seeds, 2))
  }

  test("a cycle back into settled nodes never relabels them") {
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    val d = distMap(ShortestPath.hops(e, Seq("a").toDF("node"), 10))
    d shouldBe Map("a" -> 0, "b" -> 1, "c" -> 2)
  }

  private def wDistMap(
      df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("weighted: a long cheap path beats a short expensive one") {
    // a -> z direct costs 10; a -> b -> c -> z costs 3
    val e = Seq(("a", "z", 10L), ("a", "b", 1L), ("b", "c", 1L),
      ("c", "z", 1L)).toDF("src", "dst", "w")
    val seeds = Seq("a").toDF("node")
    // 1 round: only the direct edge fits the <=1-edge bound
    wDistMap(ShortestPath.weighted(e, seeds, 1))("z") shouldBe 10L
    // 3 rounds: the cheap 3-edge path wins — the improvement of an
    // already-reached node is exactly what the hop BFS never does
    wDistMap(ShortestPath.weighted(e, seeds, 3))("z") shouldBe 3L
  }

  test("weighted with unit costs equals hop BFS where both are defined") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"))
      .toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val w = wDistMap(ShortestPath.weighted(
      e.withColumn("w", org.apache.spark.sql.functions.lit(1L)), seeds, 5))
    distMap(ShortestPath.hops(e, seeds, 5)).foreach { case (n, d) =>
      w(n) shouldBe d.toLong
    }
  }

  test("weighted multi-source takes the cheapest seed") {
    val e = Seq(("a", "m", 5L), ("z", "m", 2L)).toDF("src", "dst", "w")
    wDistMap(
      ShortestPath.weighted(e, Seq("a", "z").toDF("node"), 2))("m") shouldBe 2L
  }

  test("weighted: round k's edge-join input is exactly the improved set, and it collapses") {
    // a -> z direct costs 10; a -> x1 -> ... -> x4 -> z costs 5.
    // Improved sets round by round (the EXACT frontier discipline):
    //   r1: {a}            (seeds)         -> improves {z(10), x1(1)}
    //   r2: {z, x1}                        -> improves {x2(2)}
    //   r3: {x2}                           -> improves {x3(3)}
    //   r4: {x3}                           -> improves {x4(4)}
    //   r5: {x4}                           -> improves {z: 10 -> 5}
    //   r6: {z}                            -> improves nothing: exit
    // A naive full-table relax would feed ALL reached nodes (6 of
    // them by r3) into every edge join; the instrumented sizes prove
    // only the improved rows enter, while z's late re-improvement
    // proves re-entry still happens (the settled-set form would miss
    // the cheap 5-edge path entirely).
    val e = Seq(("a", "z", 10L), ("a", "x1", 1L), ("x1", "x2", 1L),
      ("x2", "x3", 1L), ("x3", "x4", 1L), ("x4", "z", 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq("a").toDF("node")
    val (dist, sizes) = ShortestPath.weightedInstrumented(e, seeds, 20)
    wDistMap(dist) shouldBe Map("a" -> 0L, "z" -> 5L, "x1" -> 1L,
      "x2" -> 2L, "x3" -> 3L, "x4" -> 4L)
    // 20 rounds requested; the empty improved set exits after round 6
    sizes shouldBe Seq(1L, 2L, 1L, 1L, 1L, 1L)
  }

  test("weighted: zero-weight edges relax exactly (the structural frontier argument needs no positivity)") {
    val e = Seq(("a", "b", 0L), ("b", "c", 0L), ("c", "d", 2L))
      .toDF("src", "dst", "w")
    wDistMap(ShortestPath.weighted(e, Seq("a").toDF("node"), 3)) shouldBe
      Map("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 2L)
  }
}
