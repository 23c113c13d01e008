package graft.operators

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def both(pairs: (String, String)*): Seq[(String, String)] =
    pairs ++ pairs.map(_.swap)

  private def lblMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("two cliques over a bridge resolve to two communities") {
    // 4-cliques: each bridge endpoint's three in-clique neighbors
    // outvote the one cross-bridge label every round (3-cliques are
    // too small — the min tie-break lets the globally smallest label
    // leak across a bridge when counts tie, which is authentic
    // synchronous-LPA behavior, not a bug)
    val ns = Seq("1", "2", "3", "4")
    val cliqueA = for { x <- ns; y <- ns if x < y } yield (s"a$x", s"a$y")
    val cliqueB = for { x <- ns; y <- ns if x < y } yield (s"b$x", s"b$y")
    val e = both(cliqueA ++ cliqueB :+ ("a1", "b1"): _*).toDF("src", "dst")
    val l = lblMap(LabelPropagation.labels(e, rounds = 4))
    l shouldBe Map("a1" -> "a1", "a2" -> "a1", "a3" -> "a1", "a4" -> "a1",
      "b1" -> "b1", "b2" -> "b1", "b3" -> "b1", "b4" -> "b1")
  }

  test("plurality wins; ties break to the smallest label") {
    // star: center x with leaves m, n, p — after round 1, x carries
    // the min leaf label (all counts 1), each leaf carries x
    val e = both(("x", "m"), ("x", "n"), ("x", "p")).toDF("src", "dst")
    val l1 = lblMap(LabelPropagation.labels(e, rounds = 1))
    l1("x") shouldBe "m"
    l1("m") shouldBe "x"
    // plurality: y's neighbors are two nodes labeled "q" + one "z"
    val e2 = Seq(("y", "q1"), ("y", "q2"), ("y", "z"),
      ("q1", "y"), ("q2", "y"), ("z", "y")).toDF("src", "dst")
    val seeded = lblMap(LabelPropagation.labels(e2, rounds = 2))
    // round 1: q1,q2,z all take label y; y takes min(q1,q2,z)=q1
    // round 2: y's neighbors all carry y → y:=y; leaves see y's q1
    seeded("y") shouldBe "y"
  }

  test("rounds are deterministic: same input, same labels, twice") {
    val e = both(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("c", "e")).toDF("src", "dst")
    lblMap(LabelPropagation.labels(e, rounds = 3)) shouldBe
      lblMap(LabelPropagation.labels(e, rounds = 3))
  }

  test("zero rounds returns the identity labeling") {
    val e = both(("a", "b")).toDF("src", "dst")
    lblMap(LabelPropagation.labels(e, rounds = 0)) shouldBe
      Map("a" -> "a", "b" -> "b")
  }

  test("directed input: a node whose out-neighbors are all pure sinks keeps its label") {
    // a's only out-neighbors s1, s2 have no out-edges, so they carry
    // no labels — a must persist label "a" every round, not silently
    // drop out of the labeling (the output contract covers EVERY node
    // with an out-edge); b <-> c propagate normally alongside
    val e = Seq(("a", "s1"), ("a", "s2"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    val l = lblMap(LabelPropagation.labels(e, rounds = 3))
    l.keySet shouldBe Set("a", "b", "c")
    l("a") shouldBe "a"
    // b/c swap labels each round: after 3 rounds each carries the other
    l("b") shouldBe "c"
    l("c") shouldBe "b"
  }
}
