package graft.similarity

import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "cell")

  private val e1 = Seq(1f, 0f, 0f)
  private val e1b = Seq(0.99f, 0.01f, 0f) // near-dup of e1
  private val e2 = Seq(0f, 1f, 0f)        // orthogonal

  test("lowest id survives among near-duplicates in one cell") {
    val kept = SemanticDedup.kept(
        df((3L, e1, 0), (1L, e1b, 0), (2L, e2, 0)),
        "vec_id", "embedding", "cell", minCosine = 0.95)
      .select("vec_id").as[Long].collect().toSet
    kept shouldBe Set(1L, 2L) // 3 dominated by 1; 2 orthogonal
  }

  test("identical vectors in different cells are never compared") {
    val kept = SemanticDedup.kept(
        df((1L, e1, 0), (2L, e1, 1)),
        "vec_id", "embedding", "cell", minCosine = 0.95)
      .count()
    kept shouldBe 2
  }

  test("threshold gates the drop") {
    val d = df((1L, e1, 0), (2L, e1b, 0))
    SemanticDedup.kept(d, "vec_id", "embedding", "cell", 0.9999999).count() shouldBe 2
    SemanticDedup.kept(d, "vec_id", "embedding", "cell", 0.95).count() shouldBe 1
  }

  test("chain dominance: kept row witnesses each drop directly") {
    // 1 ~ 2 and 2 ~ 3 but 1 !~ 3 at the threshold: unlike connected
    // components, 3 is dropped only if a SMALLER KEPT-OR-NOT row
    // matches it — the rule is pairwise, so 3 is dropped by 2 even
    // though 2 itself is dropped by 1. Deterministic regardless.
    val a = Seq(1f, 0f, 0f)
    val b = Seq(0.95f, 0.3122499f, 0f)  // cos(a,b) ~ 0.95
    val c = Seq(0.805f, 0.5932742f, 0f) // cos(b,c) ~ 0.95, cos(a,c) ~ 0.805
    val kept = SemanticDedup.kept(
        df((1L, a, 0), (2L, b, 0), (3L, c, 0)),
        "vec_id", "embedding", "cell", minCosine = 0.94)
      .select("vec_id").as[Long].collect().toSet
    kept shouldBe Set(1L)
  }

  test("keptIvf: exact duplicates always share a trained cell and dedup") {
    // two well-separated directions, exact duplicates within each
    val rows = Seq(
      (1L, Seq(1f, 0f, 0f), 0), (2L, Seq(1f, 0f, 0f), 0),
      (3L, Seq(0f, 1f, 0f), 0), (4L, Seq(0f, 1f, 0f), 0),
      (5L, Seq(0f, 0f, 1f), 0)).toDF("vec_id", "embedding", "cell")
    val kept = SemanticDedup.keptIvf(rows, "vec_id", "embedding",
        minCosine = 0.99, targetCellSize = 2)
      .select("vec_id").as[Long].collect().toSet
    kept shouldBe Set(1L, 3L, 5L)
  }

  test("keptIvf with one cell equals kept with a constant cell") {
    val rows = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0.99f, 0.141f, 0f)),
      (3L, Seq(0f, 1f, 0f)), (4L, Seq(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val viaIvf = SemanticDedup.keptIvf(rows, "vec_id", "embedding",
      minCosine = 0.98, targetCellSize = 100) // k = max(1, 4/100) = 1
    val viaConst = SemanticDedup.kept(
      rows.withColumn("c", org.apache.spark.sql.functions.lit(0)),
      "vec_id", "embedding", "c", 0.98).drop("c")
    assertSameRows(viaIvf, viaConst)
  }

  test("payload columns ride through untouched") {
    val rows = Seq((1L, e1, 0, "keepme")).toDF("vec_id", "embedding", "cell", "tag")
    SemanticDedup.kept(rows, "vec_id", "embedding", "cell", 0.9)
      .select("tag").as[String].collect() shouldBe Array("keepme")
  }
}
