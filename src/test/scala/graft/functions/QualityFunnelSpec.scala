package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    "min_tok" -> (expr("size(split(text, ' '))") >= 3),
    "has_x" -> col("text").contains("x"),
    "no_z" -> !col("text").contains("z"))

  private val docs = Seq(
    "a b",          // fails min_tok
    "a b c x",      // passes all
    "a b c",        // reaches has_x, fails it
    "x z q",        // reaches no_z, fails it
    "a x b z",      // reaches no_z, fails it
    "z").toDF("text") // fails min_tok (first-fail attribution, not no_z)

  test("first-fail attribution: each doc drops at exactly one stage") {
    val r = QualityFunnel.report(docs, rules)
      .select("stage", "rule", "evaluated", "dropped", "remaining")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    r shouldBe Array(
      (1L, "min_tok", 6L, 2L, 4L),
      (2L, "has_x", 4L, 1L, 3L),
      (3L, "no_z", 3L, 2L, 1L))
  }

  test("funnel arithmetic: evaluated chains, drops sum to total minus kept") {
    val r = QualityFunnel.report(docs, rules)
      .select("evaluated", "dropped", "remaining")
      .as[(Long, Long, Long)].collect()
    r.sliding(2).foreach { case Array(prev, next) =>
      next._1 shouldBe prev._3 // evaluated_{i+1} = remaining_i
    }
    val kept = QualityFunnel.kept(docs, rules).count()
    kept shouldBe r.last._3
    r.map(_._2).sum shouldBe docs.count() - kept
  }

  test("rule order changes attribution but never the survivor set") {
    val rev = rules.reverse
    val a = QualityFunnel.kept(docs, rules).as[String].collect().sorted
    val b = QualityFunnel.kept(docs, rev).as[String].collect().sorted
    a shouldBe b
    val revDrops = QualityFunnel.report(docs, rev)
      .select("rule", "dropped").as[(String, Long)].collect().toMap
    revDrops("no_z") shouldBe 3L // now catches the "z" doc first
  }

  test("null-evaluating docs are attributed to their first non-passed rule") {
    // null text makes every predicate NULL: the doc must show up as
    // dropped at stage 1, keeping drops summing to total − survivors
    val withNull = (Seq("a b c x", null): Seq[String]).toDF("text")
    val r = QualityFunnel.report(withNull, rules)
      .select("stage", "dropped", "remaining")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    r.map(_._2).sum shouldBe withNull.count() -
      QualityFunnel.kept(withNull, rules).count()
    r.head._2 shouldBe 1L   // the null doc dropped at min_tok
    r.last._3 shouldBe 1L   // the good doc survives
  }

  test("default rules report one live row per rule on a mixed corpus") {
    val mixed = Seq(
      (1L, "the quick brown fox jumps over a lazy dog of great renown " +
        "and then to market in town is where it went for fun on monday"), // passes
      (2L, "too short"),                                    // min_tokens
      (3L, ("the a of and to in is it for on " * 6).trim),  // repetition
      (4L, ("el la de y que en un por con los " * 4).trim)) // lang_en
      .toDF("doc_id", "text")
    val r = QualityFunnel.report(mixed, QualityFunnel.defaultRules(col("text")))
      .select("stage", "rule", "dropped")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    r.map(_._2) shouldBe Array("min_tokens", "max_tokens", "lang_en",
      "stopword_floor", "repetition_cap")
    r.map(_._3).sum should be >= 3L
  }
}
