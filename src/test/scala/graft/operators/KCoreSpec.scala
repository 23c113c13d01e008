package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def degMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("triangle with a pendant: the 2-core is the triangle") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"))
      .toDF("a", "b")
    degMap(KCore.core(e, k = 2)) shouldBe
      Map("a" -> 2L, "b" -> 2L, "c" -> 2L) // d peeled, c's degree drops
  }

  test("nested cores: 4-clique joined to a triangle, k = 3 keeps the clique") {
    val clique = for {
      x <- Seq("p", "q", "r", "s"); y <- Seq("p", "q", "r", "s")
      if x < y
    } yield (x, y)
    // triangle (t,u,p) hangs off clique node p: every triangle node
    // has degree < 3 after the first peel touches it
    val e = (clique ++ Seq(("t", "u"), ("p", "t"), ("p", "u"))).toDF("a", "b")
    degMap(KCore.core(e, k = 3)).keySet shouldBe Set("p", "q", "r", "s")
  }

  test("peel cascades along a path over multiple rounds") {
    // path a-b-c-d-e plus cycle f-g-h-f, k = 2: the path erodes one
    // endpoint layer per round (3 rounds), the cycle survives intact
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("f", "g"), ("g", "h"), ("f", "h")).toDF("a", "b")
    degMap(KCore.core(e, k = 2)) shouldBe
      Map("f" -> 2L, "g" -> 2L, "h" -> 2L)
    // truncated at 1 round the path's middle still survives
    val r1 = degMap(KCore.peelRounds(e, k = 2, rounds = 1))
    r1.keySet should contain allOf ("b", "c", "d")
  }

  test("peeling everything yields an empty frame, not an error") {
    val e = Seq(("a", "b"), ("b", "c")).toDF("a", "b")
    KCore.core(e, k = 2).count() shouldBe 0L
  }

  test("fixed rounds >= fixpoint equals the fixpoint core") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("f", "g"), ("g", "h"), ("f", "h")).toDF("a", "b")
    degMap(KCore.peelRounds(e, k = 2, rounds = 50)) shouldBe
      degMap(KCore.core(e, k = 2))
  }

  test("unconverged-by-maxRounds fails loudly instead of serving a non-core") {
    // a path peels exactly one layer per round from each end — the
    // adversarial O(n)-round shape the bound exists for
    val path = (0 until 12).map(i => (f"n$i%02d", f"n${i + 1}%02d"))
      .toDF("a", "b")
    an[IllegalStateException] should be thrownBy
      KCore.core(path, k = 2, maxRounds = 2)
    // with the budget it converges (to empty: a path has no 2-core)
    KCore.core(path, k = 2, maxRounds = 10).count() shouldBe 0L
  }
}
