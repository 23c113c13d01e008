package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._
  import QualityClassifier._

  private def toyFeat = {
    // separable toy set: positives have high f3, negatives low
    val rows = (0 until 40).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      (i.toLong, y, 0.5, 0.1, if (y > 0.5) 0.9 else 0.1)
    }
    rows.toDF("doc_id", "y", "f1", "f2", "f3")
  }

  test("gradient descent reduces log-loss monotonically on a separable set") {
    val f = toyFeat
    val losses = (0 to 6).map(k => logLoss(f, train(f, k, lr = 1.0)))
    losses.sliding(2).foreach { case Seq(a, b) => b should be < a; case _ => }
    // untrained = ln 2
    losses.head shouldBe 0.693147 +- 1e-6
  }

  test("the learned model separates the classes it was trained on") {
    val f = toyFeat
    val m = train(f, iters = 25, lr = 1.0)
    val scored = score(f, m).select("label", "score").collect()
    val pos = scored.filter(_.getInt(0) == 1).map(_.getDouble(1))
    val neg = scored.filter(_.getInt(0) == 0).map(_.getDouble(1))
    pos.min should be > neg.max
    m.w3 should be > 0.0 // the separating feature carries the weight
  }

  test("training is deterministic: two runs produce identical weights") {
    val docs = Seq(
      (1L, "the cat sat on the mat for a while and it is fine", "en"),
      (2L, "el gato con los perros y que en un por", "es"),
      (3L, "the dog is in the park for the day", "en"),
      (4L, "der hund und die katze in den garten mit", "de"))
      .toDF("doc_id", "text", "lang")
    val feat = features(docs, "doc_id", col("text"), col("lang"), "en")
    val a = train(feat, 5, 1.0)
    val b = train(feat, 5, 1.0)
    a shouldBe b
  }

  test("stored features equal the inline scan and advance O(new) on append") {
    import java.nio.file.Files
    val sf = Files.createTempDirectory("lrfeat-inc").toString
    val corpus = s"$sf/documents.parquet"
    Seq((1L, "the cat is on the mat for a while", "en"),
      (2L, "el gato y los perros en un por", "es"))
      .toDF("doc_id", "text", "lang").coalesce(1).write.parquet(corpus)
    def inline() = features(spark.read.parquet(corpus), "doc_id",
      col("text"), col("lang"), "en")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    def stored() = ClassifierFeatureStore.features(spark, sf, "documents")
      .select("doc_id", "y", "f1", "f2", "f3")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    stored() shouldBe inline()
    Seq((3L, "the dog is in the park for the day", "en"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1).write.mode("append").parquet(corpus)
    stored() shouldBe inline()
    stored().keySet shouldBe Set(1L, 2L, 3L)
  }

  test("each training iteration is one aggregate scan, no shuffle of the corpus") {
    val f = toyFeat
    // the gradient job's plan: partial + final HashAggregate over a
    // single scan; the only exchange moves 4 doubles per partition
    val p = f.select(round(avg(col("y") * col("f1")), 8))
      .queryExecution.executedPlan.toString
    p should include("HashAggregate")
    p.split("Exchange").length - 1 should be <= 1
  }
}
