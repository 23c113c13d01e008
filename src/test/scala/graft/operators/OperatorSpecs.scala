package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.Watermark

/** IncrementalScan — reference S2 half-open window
  * (pyCassElastic.py:205-212), standardized to (last, this].
  */
class IncrementalScanSpec extends SparkSpec {
  import spark.implicits._

  test("selects exactly the half-open window (last, this]") {
    val df = Seq(("a", 10L), ("b", 11L), ("c", 20L), ("d", 21L))
      .toDF("id", "version")
    val out = IncrementalScan(df, "version", Watermark.Span(10L, 20L))
      .select("id").as[String].collect().sorted
    out shouldBe Array("b", "c") // 10 excluded, 20 included
  }

  test("optional projection narrows columns (reference fields_list)") {
    val df = Seq(("a", 15L, "x")).toDF("id", "version", "text")
    val out = IncrementalScan(df, "version", Watermark.Span(10L, 20L), Seq("id"))
    out.columns shouldBe Array("id")
  }

  test("window predicate is pushed to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("scan").toString
    Seq(("a", 10L), ("b", 15L)).toDF("id", "version")
      .write.mode("overwrite").parquet(dir)
    val scanned = IncrementalScan(
      spark.read.parquet(dir), "version", Watermark.Span(10L, 20L))
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(version,10)"),
      s"window filter not pushed to scan:\n$plan")
  }
}

/** AntiEcho — reference S4 `not term source=X` (pyCassElastic.py:386-399). */
class AntiEchoSpec extends SparkSpec {
  import spark.implicits._

  test("drops the destination's own rows, keeps others AND nulls") {
    val df = Seq(("1", "cass"), ("2", "es"), ("3", null))
      .toDF("id", "source")
    val out = AntiEcho(df, "source", "es").select("id").as[String].collect().sorted
    out shouldBe Array("1", "3") // null-source row kept (unknown origin syncs)
  }
}

/** ConflictSplit — winners/losers partition (reference 409 parse + delete
  * set, pyCassElastic.py:508-582).
  */
class ConflictSplitSpec extends SparkSpec {
  import spark.implicits._

  private val batch = Seq(
    ("a", 1L), ("a", 3L), ("a", 2L), ("b", 5L), ("c", 7L), ("c", 6L)
  ).toDF("id", "version")

  test("winners ∪ losers = input, disjoint; winners = LWW survivors") {
    val (w, l) = ConflictSplit.split(batch, Seq("id"), "version")
    assertSameRows(w.unionByName(l), batch)
    assertSameRows(w, LwwMerge.latestWindow(batch, Seq("id"), "version"))
    l.select("id", "version").as[(String, Long)].collect().sorted shouldBe
      Array(("a", 1L), ("a", 2L), ("c", 6L))
  }

  test("tagged = split as one frame (the single-pass sync-tick form)") {
    val (w, l) = ConflictSplit.split(batch, Seq("id"), "version")
    val t = ConflictSplit.tagged(batch, Seq("id"), "version")
    assertSameRows(t.filter(col("action") === "upsert").drop("action"), w)
    assertSameRows(t.filter(col("action") === "delete").drop("action"), l)
    // one ranked pass: a single window shuffle, no union of branches
    t.queryExecution.executedPlan.toString should not include "Union"
  }
}

/** SchemaTools — diff / additive evolution / null-pad alignment
  * (reference sync_schemas pyCassElastic.py:412-446, insert-side padding
  * :270-274; scenario = testDifferentSchemas tests/testSyncClass.py:216-268).
  */
class SchemaToolsSpec extends SparkSpec {
  import spark.implicits._

  private val cass = Seq(("1", 1L, "t")).toDF("id", "version", "text")
  private val es = Seq(("1", 2L, "t", "extra")).toDF("id", "version", "text", "new_col")

  test("missingIn finds the extra field, ignoring excluded id") {
    SchemaTools.missingIn(cass.schema, es.schema, exclude = Seq("id"))
      .map(_.name) shouldBe Seq("new_col")
    SchemaTools.missingIn(es.schema, cass.schema) shouldBe Nil
  }

  test("evolve appends missing fields, never drops or retypes") {
    val evolved = SchemaTools.evolve(cass.schema, es.schema)
    evolved.fieldNames shouldBe Array("id", "version", "text", "new_col")
    evolved("version").dataType shouldBe LongType
  }

  test("align null-pads missing columns and drops extras") {
    val aligned = SchemaTools.align(cass, SchemaTools.evolve(cass.schema, es.schema))
    aligned.columns shouldBe Array("id", "version", "text", "new_col")
    assert(aligned.collect().head.isNullAt(3))
    // extras dropped: aligning es onto cass's schema loses new_col
    SchemaTools.align(es, cass.schema).columns shouldBe Array("id", "version", "text")
  }

  test("alignBoth makes both sides union-compatible") {
    val (a, b, unified) = SchemaTools.alignBoth(cass, es)
    a.schema shouldBe b.schema
    unified.fieldNames.toSet shouldBe Set("id", "version", "text", "new_col")
    a.unionByName(b).count() shouldBe 2
  }

  test("align casts mismatched-but-compatible types to the target") {
    val ints = Seq(("1", 5)).toDF("id", "version") // version as int
    val aligned = SchemaTools.align(ints, cass.schema)
    aligned.schema("version").dataType shouldBe LongType
  }

  test("type conflicts are detected and evolve fails loudly on them") {
    // the reference's single-entry type map (pyCassElastic.py:503) let
    // cross-store type drift through silently; the seam must refuse
    val retyped = Seq(("1", "not-a-long", "t")).toDF("id", "version", "text")
    val conflicts = SchemaTools.typeConflicts(cass.schema, retyped.schema)
    conflicts.map { case (t, s) =>
      (t.name, t.dataType, s.dataType) } shouldBe
      Seq(("version", LongType, StringType))
    // excluded (id-like) columns don't count as conflicts
    SchemaTools.typeConflicts(cass.schema, retyped.schema,
      exclude = Seq("version")) shouldBe Nil
    val e = intercept[IllegalArgumentException] {
      SchemaTools.evolve(cass.schema, retyped.schema)
    }
    e.getMessage should include("version: bigint vs string")
    // explicit opt-out keeps the target's type (align then casts)
    SchemaTools.evolve(cass.schema, retyped.schema,
      failOnTypeConflict = false)("version").dataType shouldBe LongType
  }

  test("evolveTable drives ADD COLUMNS through the catalog; old rows null-pad") {
    // the reference's sync_schemas DDL side effect
    // (pyCassElastic.py:438-444) against a real catalog table
    val table = "graft_evolve_t"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      cass.write.saveAsTable(table)
      val added = SchemaTools.evolveTable(spark, table, es.schema)
      added.map(_.name) shouldBe Seq("new_col")
      // catalog schema evolved; the pre-existing row reads NULL there
      val evolved = spark.table(table)
      evolved.columns shouldBe Array("id", "version", "text", "new_col")
      assert(evolved.select("new_col").collect().head.isNullAt(0))
      // idempotent: nothing further to add
      SchemaTools.evolveTable(spark, table, es.schema) shouldBe Nil
      // new-schema rows land next to old ones, types intact
      SchemaTools.align(es, evolved.schema)
        .write.mode("append").saveAsTable(table)
      spark.table(table).count() shouldBe 2
      spark.table(table).where(col("new_col") === "extra").count() shouldBe 1
      // type conflicts refuse before any DDL runs
      val retyped = Seq(("1", "not-a-long", "t")).toDF("id", "version", "text")
      intercept[IllegalArgumentException] {
        SchemaTools.evolveTable(spark, table, retyped.schema)
      }.getMessage should include("version")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("dropped upstream columns are surfaced, not silently null-padded") {
    val narrower = Seq(("1", 1L)).toDF("id", "version") // lost "text"
    SchemaTools.droppedFrom(cass.schema, narrower.schema)
      .map(_.name) shouldBe Seq("text")
    SchemaTools.droppedFrom(cass.schema, narrower.schema,
      exclude = Seq("text")) shouldBe Nil
    // additive evolution still keeps the dropped field (never DROPs)
    SchemaTools.evolve(cass.schema, narrower.schema)
      .fieldNames should contain("text")
  }
}

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a"), Some(2.5)),
    (Some(2L), None, Some(7.125)),
    (Some(2L), Some("b"), None)).toDF("k", "s", "v")

  test("null / distinct / rendered min-max per column") {
    val out = Profile.profile(df, Seq(
        Profile.Spec("k"), Profile.Spec("s"),
        Profile.Spec("v", org.apache.spark.sql.functions.round(_, 1))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet
    out shouldBe Set(
      ("k", 0L, 2L, "1", "2"),
      ("s", 1L, 2L, "a", "b"),
      ("v", 1L, 2L, "2.5", "7.1"))
  }

  test("all metrics ride one scan of the input") {
    val plan = Profile.profile(df, Seq(Profile.Spec("k"), Profile.Spec("v")))
      .queryExecution.executedPlan.toString
    // one source scan only: metrics must not re-read the table per column
    "LocalTableScan".r.findAllIn(plan).size shouldBe 1
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val df = (0L until 4000L).map(i => (i, if (i % 4 == 0) "en" else "other"))
    .toDF("id", "lang")

  test("membership is deterministic and content-stable under corpus growth") {
    val s1 = Sampling.stratifiedHash(df, "id", "lang",
      Seq("en" -> 0.5), defaultRate = 0.25).select("id").as[Long].collect().toSet
    val s2 = Sampling.stratifiedHash(df, "id", "lang",
      Seq("en" -> 0.5), defaultRate = 0.25).select("id").as[Long].collect().toSet
    s1 shouldBe s2
    // growing the corpus never flips an existing row's membership
    val grown = df.union(Seq((99991L, "en"), (99992L, "other")).toDF("id", "lang"))
    val s3 = Sampling.stratifiedHash(grown, "id", "lang",
      Seq("en" -> 0.5), defaultRate = 0.25).select("id").as[Long].collect().toSet
    (s3 intersect s1) shouldBe s1
  }

  test("per-stratum rates are honored within hash tolerance") {
    val sampled = Sampling.stratifiedHash(df, "id", "lang",
      Seq("en" -> 0.5), defaultRate = 0.25)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    sampled("en").toDouble / 1000 shouldBe 0.5 +- 0.06
    sampled("other").toDouble / 3000 shouldBe 0.25 +- 0.05
  }

  test("rate 0 keeps nothing; rate 1 keeps everything") {
    Sampling.stratifiedHash(df, "id", "lang", Nil, defaultRate = 0.0)
      .count() shouldBe 0L
    Sampling.stratifiedHash(df, "id", "lang", Nil, defaultRate = 1.0)
      .count() shouldBe 4000L
  }

  test("weightedPriority: deterministic, and heavier rows win far more often") {
    val wdf = (0L until 2000L)
      .map(i => (i, if (i % 2 == 0) 100.0 else 1.0)).toDF("id", "w")
    def top(k: Int) = Sampling.weightedPriority(wdf, "id", col("w"))
      .orderBy("_priority", "id").limit(k).select("id").as[Long].collect().toSet
    top(100) shouldBe top(100) // replay-stable
    // ~99% of the top-100 should be the weight-100 (even-id) rows
    val heavy = top(100).count(_ % 2 == 0)
    heavy.toDouble should be >= 90.0
    // priorities are strictly positive and finite — INCLUDING the
    // top hash bucket (key 12673 md5-hashes to bucket 4095, which a
    // /4096 normalization would send to u=1.0, priority exactly 0)
    val edge = Seq((12673L, 1e9)).toDF("id", "w")
    val ps = Sampling.weightedPriority(wdf.union(edge), "id", col("w"))
      .select("_priority").as[Double].collect()
    ps.foreach { p => p should be > 0.0; java.lang.Double.isFinite(p) shouldBe true }
  }

  test("mixture: α<1 flattens source proportions toward the tail") {
    // 3000 'big' vs 300 'small': natural proportions 10:1; α=0.5
    // re-weights to sqrt-counts (√3000:√300 ≈ 3.16:1), so the small
    // source's SAMPLING RATE must exceed the big one's
    val mdf = ((0L until 3000L).map((_, "big")) ++
      (10000L until 10300L).map((_, "small"))).toDF("id", "src")
    val thr = Sampling.mixtureThresholds(mdf, "src", alpha = 0.5,
        targetFraction = 0.3)
      .as[(String, Long, Int)].collect().map(t => t._1 -> t._3).toMap
    thr("small").toDouble should be > (thr("big").toDouble * 2.5)

    val kept = Sampling.mixture(mdf, "id", "src", 0.5, 0.3)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    // overall volume ~30% of 3300, within hash tolerance
    (kept("big") + kept("small")).toDouble / 3300 shouldBe 0.3 +- 0.05
    // the flattened mix: small keeps a ~3.2x higher fraction than big
    val rateBig = kept("big").toDouble / 3000
    val rateSmall = kept("small").toDouble / 300
    rateSmall / rateBig shouldBe 3.16 +- 0.8

    // determinism: same call, same membership
    Sampling.mixture(mdf, "id", "src", 0.5, 0.3)
      .select("id").as[Long].collect().toSet shouldBe
      Sampling.mixture(mdf, "id", "src", 0.5, 0.3)
        .select("id").as[Long].collect().toSet
  }

  test("mixture: null source is its own group, α=1 preserves proportions") {
    val mdf = ((0L until 1000L).map(i => (i, "a")) ++
      (2000L until 2500L).map(i => (i, null: String))).toDF("id", "src")
    val kept = Sampling.mixture(mdf, "id", "src", alpha = 1.0,
        targetFraction = 0.5)
      .groupBy("src").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // α=1 ⇒ every source keeps ≈ targetFraction of itself
    kept(Some("a")).toDouble / 1000 shouldBe 0.5 +- 0.06
    kept(None).toDouble / 500 shouldBe 0.5 +- 0.08
  }
}

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("known interleavings") {
    // x=0b11 -> even bits 0,2 = 5; y=0b01 -> odd bit 1 = 2; z = 7
    val out = Seq((3L, 1L), (0L, 0L), (0L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    out shouldBe Seq(7L, 0L, 10L) // (0, 0b11) -> odd bits 1,3 = 2+8
  }

  test("z-prefix buckets bound both dimensions (the pruning property)") {
    val n = 4096
    val df = spark.range(n).select(
      (col("id") * 2654435761L % 256).as("x"),
      (col("id") * 2246822519L % 256).as("y"))
    val buckets = df
      .groupBy(shiftright(ZOrder.zValue(col("x"), col("y"), bits = 8), 8)
        .as("bucket"))
      .agg((max(col("x")) - min(col("x"))).as("wx"),
        (max(col("y")) - min(col("y"))).as("wy"))
    // a z>>8 bucket fixes the top 4 bits of each dim: width <= 2^4
    buckets.filter(col("wx") > 15 || col("wy") > 15).count() shouldBe 0L
  }
}
