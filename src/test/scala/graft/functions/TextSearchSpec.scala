package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark engine"),     // tf(spark)=3
    (2L, "spark engine"),                 // tf(spark)=1
    (3L, "engine engine engine engine"),  // no query term
    (4L, "spark rare"))                   // both terms
    .toDF("doc_id", "text")
  private def norm = TextFunctions.normalize(col("text"))

  private def scores(terms: String*): Map[Long, (Long, Double)] =
    TextSearch.bm25(docs, "doc_id", norm, terms)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("only documents containing >=1 query term appear") {
    scores("spark").keySet shouldBe Set(1L, 2L, 4L)
  }

  test("higher tf at equal length scores higher; tf saturates sublinearly") {
    val s = scores("spark")
    // doc1 (tf=3, dl=4) vs doc2 (tf=1, dl=2): higher raw tf wins
    s(1L)._2 should be > s(2L)._2
    // saturation: tripling tf must NOT triple the score contribution
    s(1L)._2 should be < 3 * s(2L)._2
  }

  test("rarer term carries more idf weight") {
    // 'rare' appears in 1 doc, 'spark' in 3: for doc 4 (tf=1 each,
    // same dl) the rare term must contribute more than the common one
    val both = scores("spark", "rare")
    val sparkOnly = scores("spark")
    val rareOnly = scores("rare")
    rareOnly(4L)._2 should be > sparkOnly(4L)._2
    // n_terms counts distinct matched query terms (boolean AND handle)
    both(4L)._1 shouldBe 2L
    both(1L)._1 shouldBe 1L
  }

  test("AND semantics via n_terms filter") {
    val and = TextSearch.bm25(docs, "doc_id", norm, Seq("spark", "rare"))
      .filter(col("n_terms") === 2)
      .select("doc_id").as[Long].collect()
    and shouldBe Array(4L)
  }

  test("bm25 == bm25OverPostings on a prebuilt index (the production path)") {
    val post = TextSearch.postings(docs, "doc_id", norm)
    assertSameRows(
      TextSearch.bm25(docs, "doc_id", norm, Seq("spark", "engine")),
      TextSearch.bm25OverPostings(post, "doc_id", Seq("spark", "engine")))
  }

  test("duplicate query terms don't double-count") {
    assertSameRows(
      TextSearch.bm25(docs, "doc_id", norm, Seq("spark", "spark")),
      TextSearch.bm25(docs, "doc_id", norm, Seq("spark")))
  }

  test("precomputed corpus stats (the persisted-index path) score identically") {
    val post = TextSearch.postings(docs, "doc_id", norm)
    val stats = TextSearch.corpusStats(post, "doc_id")
    assertSameRows(
      TextSearch.bm25OverPostings(post, "doc_id", Seq("spark", "rare"),
        stats = Some(stats)),
      TextSearch.bm25OverPostings(post, "doc_id", Seq("spark", "rare")))
  }

  test("bm25Batch scores each query identically to the single-query path") {
    val post = TextSearch.postings(docs, "doc_id", norm)
    val queries = Seq((0L, "spark"), (0L, "rare"), (1L, "engine"))
      .toDF("query_id", "term")
    val batch = TextSearch.bm25Batch(post, "doc_id", queries)
    assertSameRows(
      batch.filter(col("query_id") === 0).drop("query_id"),
      TextSearch.bm25OverPostings(post, "doc_id", Seq("spark", "rare")))
    assertSameRows(
      batch.filter(col("query_id") === 1).drop("query_id"),
      TextSearch.bm25OverPostings(post, "doc_id", Seq("engine")))
  }

  test("bm25Batch: duplicate (query_id, term) rows don't inflate scores") {
    val post = TextSearch.postings(docs, "doc_id", norm)
    val clean = Seq((0L, "spark"), (0L, "rare")).toDF("query_id", "term")
    val dupes = Seq((0L, "spark"), (0L, "spark"), (0L, "rare"), (0L, "rare"))
      .toDF("query_id", "term")
    assertSameRows(
      TextSearch.bm25Batch(post, "doc_id", dupes),
      TextSearch.bm25Batch(post, "doc_id", clean))
  }

  test("phraseMatch: adjacency and order are required; occurrences counted") {
    val d = Seq(
      (1L, "fast table scan wins"),       // 1 hit
      (2L, "table scan fast"),            // right words, wrong order
      (3L, "fast big table scan"),        // gap breaks adjacency
      (4L, "fast table scan fast table scan"), // 2 hits
      (5L, "unrelated")).toDF("doc_id", "text")
    val idx = TextSearch.positionalPostings(
      d, "doc_id", TextFunctions.normalize(col("text")))
    val got = TextSearch.phraseMatch(idx, "doc_id", Seq("fast", "table", "scan"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 4L -> 2L)
  }

  test("phraseMatch: overlapping occurrences of a self-similar phrase all count") {
    val d = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val idx = TextSearch.positionalPostings(
      d, "doc_id", TextFunctions.normalize(col("text")))
    TextSearch.phraseMatch(idx, "doc_id", Seq("a", "a"))
      .collect().map(r => r.getLong(1)) shouldBe Array(3L)
  }

  test("phraseMatch: single-word phrase degenerates to term lookup with tf") {
    val d = Seq((1L, "x y x"), (2L, "y")).toDF("doc_id", "text")
    val idx = TextSearch.positionalPostings(
      d, "doc_id", TextFunctions.normalize(col("text")))
    TextSearch.phraseMatch(idx, "doc_id", Seq("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
  }

  test("fuzzyTerms: edit-distance neighbors with df, exact term at dist 0") {
    val d = Seq(
      (1L, "scan scan scam"), (2L, "scan plan"), (3L, "scene")).toDF("doc_id", "text")
    val post = TextSearch.postings(d, "doc_id", TextFunctions.normalize(col("text")))
    val got = TextSearch.fuzzyTerms(post, "scan", maxDist = 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // scan: df 2, dist 0; scam: df 1, dist 1; plan: dist 2 excluded;
    // scene: length band |5-4|<=1 passes but dist 2 excluded
    got shouldBe Map("scan" -> ((2L, 0)), "scam" -> ((1L, 1)))
    TextSearch.fuzzyTerms(post, "scan", maxDist = 0)
      .collect().map(_.getString(0)) shouldBe Array("scan")
  }

  test("idf is non-negative even for a term in every document") {
    val all = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("doc_id", "text")
    val s = TextSearch.bm25(all, "doc_id", TextFunctions.normalize(col("text")), Seq("x"))
      .select("score").as[Double].collect()
    all.count() shouldBe s.length
    s.foreach(_ should be > 0.0)
  }

  test("max-score pruned top-k is bit-identical to the naive path") {
    val common = Array("the", "of", "and", "data", "scan", "run")
    val rare = Array.tabulate(30)(i => s"uniq$i")
    for (seed <- Seq(5L, 23L, 64L)) {
      val rnd = new scala.util.Random(seed)
      val corpus = (0L until 50L).map { i =>
        val words = Seq.fill(4 + rnd.nextInt(5))(
          common(rnd.nextInt(common.length))) ++
          Seq.fill(1 + rnd.nextInt(2))(rare(rnd.nextInt(rare.length)))
        (i, rnd.shuffle(words).mkString(" "))
      }.toDF("doc_id", "text")
      val post = TextSearch.postings(
        corpus, "doc_id", TextFunctions.normalize(col("text")))
        .localCheckpoint()
      val stats = TextSearch.corpusStats(post, "doc_id").localCheckpoint()
      val bounds = TextSearch.termBounds(post).localCheckpoint()
      // queries mix a frequent term (prunable postings) + rare ones
      val queries = (0 until 5).map { q =>
        Seq((q.toLong, common(rnd.nextInt(common.length))),
          (q.toLong, rare(rnd.nextInt(rare.length))),
          (q.toLong, rare(rnd.nextInt(rare.length))))
      }.flatten.toDF("query_id", "term")
      withClue(s"seed=$seed: ") {
        // pinned pruned branch AND the default adaptive form
        assertSameRows(
          TextSearch.bm25TopKBatchPruned(post, "doc_id", queries, k = 3,
            bounds, stats, fallbackFrac = Double.MaxValue),
          TextSearch.bm25TopKBatch(post, "doc_id", queries, k = 3,
            stats = Some(stats)))
        assertSameRows(
          TextSearch.bm25TopKBatchPruned(post, "doc_id", queries, k = 3,
            bounds, stats),
          TextSearch.bm25TopKBatch(post, "doc_id", queries, k = 3,
            stats = Some(stats)))
      }
    }
  }

  test("termBounds: per-term df exact, tf/dl extremes bound every posting") {
    val post = TextSearch.postings(docs, "doc_id", norm)
    val b = TextSearch.termBounds(post).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    b("spark") shouldBe ((3L, 3L, 2))
    b("engine") shouldBe ((3L, 4L, 2))
    b("rare") shouldBe ((1L, 1L, 2))
  }
}
