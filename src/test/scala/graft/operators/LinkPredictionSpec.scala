package graft.operators

import graft.SparkSpec

class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  test("open wedges only: adjacent pairs are excluded, counts and degrees exact") {
    // square a-b-c-d-a plus chord a-c: candidates are the single
    // remaining non-adjacent pair (b, d) with common neighbors {a, c}
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("a", "c"))
      .toDF("a", "b")
    rows(LinkPrediction.commonNeighbors(e, minCommon = 2)) shouldBe
      Set(("b", "d", 2L, 2L, 2L))
    // minCommon above the wedge count empties the candidates
    LinkPrediction.commonNeighbors(e, minCommon = 3).count() shouldBe 0
  }

  test("degrees are full-graph even when a hub is capped out of the mediator role") {
    // hub h connects x, y, z (star): every pair shares only h
    val e = Seq(("h", "x"), ("h", "y"), ("h", "z"), ("x", "y"))
      .toDF("a", "b")
    // uncapped: (x,z) and (y,z) are wedge candidates through h;
    // (x,y) is adjacent so excluded
    rows(LinkPrediction.commonNeighbors(e, minCommon = 1)) shouldBe
      Set(("x", "z", 1L, 2L, 1L), ("y", "z", 1L, 2L, 1L))
    // cap 2 removes h (degree 3) as a mediator: no wedges survive,
    // even though x/y/z keep their full degrees elsewhere
    LinkPrediction.commonNeighbors(e, minCommon = 1,
      degreeCap = Some(2L)).count() shouldBe 0
  }

  test("duplicate input edges do not inflate counts") {
    val e = Seq(("a", "b"), ("a", "b"), ("b", "c")).toDF("a", "b")
    rows(LinkPrediction.commonNeighbors(e, minCommon = 1)) shouldBe
      Set(("a", "c", 1L, 1L, 1L))
  }
}
