package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  test("rrf scores are exact rational sums of the per-list reciprocals") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val vec = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val got = HybridSearch.rrfFuse(Seq(lex, vec), "id", k = 60)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    got(10L) shouldBe ((2L, 1.0 / 61 + 1.0 / 62))
    got(20L) shouldBe ((2L, 1.0 / 62 + 1.0 / 61))
    got(30L) shouldBe ((1L, 1.0 / 63))
    got(40L) shouldBe ((1L, 1.0 / 63))
  }

  test("ids in both lists always beat ids in one (the RRF consensus property)") {
    val a = (1 to 50).map(i => (i.toLong, i)).toDF("id", "rank")
    val b = (1 to 50).map(i => (i.toLong, 51 - i)).toDF("id", "rank") // reversed
    val only = Seq((99L, 1)).toDF("id", "rank")
    val fused = HybridSearch.rrfFuse(Seq(a, b, only), "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val worstBoth = fused.filterKeys(_ != 99L).values.min
    // 99 ranked FIRST in its list but appears in only one of three
    worstBoth should be > fused(99L)
  }

  test("single list degenerates to the reciprocal of its own ranks") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val got = HybridSearch.rrfFuse(Seq(a), "id", k = 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    got shouldBe Map(1L -> 1.0, 2L -> 0.5)
  }
}
