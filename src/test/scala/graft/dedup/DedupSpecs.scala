package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class ExactDedupSpec extends SparkSpec {
  import spark.implicits._

  test("identical-after-normalization docs collapse to the min id") {
    val docs = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "  HELLO WORLD  "),
      (4L, "different")).toDF("doc_id", "text")
    val out = ExactDedup.dropExact(docs, "doc_id", col("text"))
    out.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 4L)
    val g = ExactDedup.groups(docs, "doc_id", col("text"))
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    g shouldBe Set((1L, 3L), (4L, 1L))
  }
}

class MinHashLSHSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely unrelated text about spark engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog") // exact dup of 1
  ).toDF("doc_id", "text")

  test("signature has k elements and is identical for identical docs") {
    val sigs = docs.select(col("doc_id"),
        MinHashLSH.signature(Shingles.charShingles(
          TextFunctions.normalize(col("text")))).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    sigs(1L).length shouldBe MinHashLSH.defaultK
    sigs(1L) shouldBe sigs(4L)
    sigs(1L) should not be sigs(3L)
  }

  test("near-dup and exact-dup pairs collide; unrelated docs do not") {
    val pairs = MinHashLSH.candidatePairs(docs, "doc_id",
        TextFunctions.normalize(col("text")))
      .as[(Long, Long)].collect().toSet
    pairs should contain((1L, 4L)) // identical => all bands collide
    pairs should contain((1L, 2L)) // near-dup => overwhelmingly likely
    pairs should not contain ((1L, 3L))
  }

  test("nearDuplicates scores exact dup 1.0 and ranks near-dup above threshold") {
    val nd = MinHashLSH.nearDuplicates(docs, "doc_id", col("text"), threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    nd((1L, 4L)) shouldBe 1.0
    nd((1L, 2L)) should be > 0.5
  }
}

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def stats(docs: Seq[(Long, String)], n: Int = 8) =
    SpanDedup.spanStats(docs.toDF("doc_id", "text"), "doc_id", col("text"), n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_spans"),
        r.getAs[Long]("dup_spans"), r.getAs[Double]("dup_ratio")))).toMap

  test("earliest (doc, pos) occurrence keeps the span; later ones are duplicates") {
    val r = stats(Seq(
      (1L, "one two three four five six seven eight nine"),
      (2L, "one two three four five six seven eight different tail"),
      (3L, "zzz"),
      (4L, "zzz")))
    r(1L) shouldBe ((2L, 0L, 0.0))   // both spans first seen here
    r(2L) shouldBe ((3L, 1L, 0.3333)) // its pos-1 span already in doc 1
    r(3L) shouldBe ((1L, 0L, 0.0))   // short doc: whole text is one span
    r(4L) shouldBe ((1L, 1L, 1.0))   // exact short dup of doc 3
  }

  test("a span repeated WITHIN one document counts its later occurrence as dup") {
    val r = stats(Seq((1L, "a b c d e f g h a b c d e f g h")))
    // 16 tokens -> 9 spans; pos 9 repeats pos 1's text verbatim
    r(1L) shouldBe ((9L, 1L, 0.1111))
  }

  test("every document reports exactly once, disjoint corpora all zero") {
    val r = stats(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "iota kappa lambda mu nu xi omicron pi rho")))
    r.keySet shouldBe Set(1L, 2L)
    r.values.foreach { case (_, dups, ratio) =>
      dups shouldBe 0L; ratio shouldBe 0.0
    }
  }

  test("hashed span keys (the scale path) report identically to span strings") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight different tail here"),
      (3L, "tiny"), (4L, "tiny")).toDF("doc_id", "text")
    assertSameRows(
      SpanDedup.spanStats(docs, "doc_id", col("text"), hashSpans = false),
      SpanDedup.spanStats(docs, "doc_id", col("text"), hashSpans = true))
  }

  test("dupRuns merges adjacent dup spans into maximal runs") {
    // doc 2 repeats doc 1's first 10 tokens verbatim, then diverges:
    // with n=8, dup span starts in doc 2 are positions 1,2,3 -> ONE
    // run [1..3], covering tokens 1..10 (run_tokens = 3-1+8 = 10);
    // doc 4 is an exact short dup of doc 3 -> one whole-text run.
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 a b c d e f"),
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 x y z w v u"),
      (3L, "zzz short"), (4L, "zzz short")).toDF("doc_id", "text")
    val runs = SpanDedup.dupRuns(docs, "doc_id", col("text"))
      .select("doc_id", "run_start", "run_end", "run_tokens", "n_spans")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    runs shouldBe Array((2L, 1L, 3L, 10L, 3L), (4L, 1L, 1L, 8L, 1L))
    // stats and runs agree on total dup-span volume
    val statDups = SpanDedup.spanStats(docs, "doc_id", col("text"))
      .agg(sum("dup_spans")).collect().head.getLong(0)
    runs.map(_._5).sum shouldBe statDups
  }

  test("cutText removes exactly the dup runs; earliest occurrence survives") {
    // doc 2's first 10 tokens are doc 1's verbatim -> cut; its tail
    // survives. doc 4 is a whole-doc dup of doc 3 -> cut to empty.
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 a b c d e f"),
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 x y z w v u"),
      (3L, "zzz short"), (4L, "zzz short")).toDF("doc_id", "text")
    val cut = SpanDedup.cutText(docs, "doc_id", col("text"))
      .select("doc_id", "text_dedup", "n_tokens", "cut_tokens")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    cut shouldBe Array(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 a b c d e f", 16L, 0L),
      (2L, "x y z w v u", 16L, 10L),
      (3L, "zzz short", 2L, 0L),
      (4L, "", 2L, 2L))
    // cut volume equals dupRuns' run_tokens for full-length docs
    // (short docs < n report the nominal span width, clamp to doc)
    val runTok = SpanDedup.dupRuns(docs, "doc_id", col("text"))
      .groupBy("doc_id").agg(sum("run_tokens").as("rt"))
      .as[(Long, Long)].collect().toMap
    cut(1)._4 shouldBe runTok(2L)
  }

  test("cutText over hashed span keys matches the string-key cut") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight different tail here"),
      (3L, "tiny"), (4L, "tiny")).toDF("doc_id", "text")
    assertSameRows(
      SpanDedup.cutText(docs, "doc_id", col("text"), hashSpans = false),
      SpanDedup.cutText(docs, "doc_id", col("text"), hashSpans = true))
  }

  test("ids outside the packable range fail loudly instead of mis-electing") {
    // doc_id = 2^43 overflows the default posBits=20 pack (id must be
    // < 2^43); before the guard this silently corrupted occurrence
    // ordering — now the job raises.
    val bad = Seq((1L << 43, "alpha beta gamma")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      SpanDedup.spanStats(bad, "doc_id", col("text")).collect()
    }
    e.getMessage should include("packable range")
  }
}

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  test("identical docs get identical simhash; near docs are close in Hamming") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val sims = SimHash.compute(docs, "doc_id", TextFunctions.normalize(col("text")))
      .as[(Long, Long)].collect().toMap
    sims(1L) shouldBe sims(3L)
    val hamming = java.lang.Long.bitCount(sims(1L) ^ sims(2L))
    assert(hamming <= 10, s"near docs should be Hamming-close, got $hamming")
    sims(1L) should be >= 0L // 32-bit => fits long, non-negative
    sims(1L) should be < (1L << 32)
  }

  test("nearPairs finds same-block close pairs") {
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"),
      (3L, "seven eight nine ten eleven twelve thirteen fourteen"))
      .toDF("doc_id", "text")
    val sims = SimHash.compute(docs, "doc_id", TextFunctions.normalize(col("text")))
    val pairs = SimHash.nearPairs(sims, "doc_id", maxDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L))
  }

  test("blocked nearPairs has recall 1.0: equals brute-force Hamming <= 3") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sims = SimHash.compute(docs, "doc_id", TextFunctions.normalize(col("text")))
    val blocked = SimHash.nearPairsBlocked(sims, "doc_id", maxDist = 3, blocks = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force over all pairs — the ground truth
    val a = sims.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = sims.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .filter(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    blocked shouldBe brute
  }

  test("64-bit simhash: 16-bit blocks keep recall 1.0 (the >50k-doc sizing)") {
    // the wide form SURVEY §9's sizing law calls for past ~50k docs:
    // block width 16 outgrows log2(n), so bucket occupancy stays ~1
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sims = SimHash.compute(docs, "doc_id",
      TextFunctions.normalize(col("text")), bits = 64)
    val blocked = SimHash.nearPairsBlocked(sims, "doc_id",
        maxDist = 3, blocks = 4, bits = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = sims.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = sims.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .filter(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    blocked shouldBe brute
    // identical docs still collide at distance 0 in the 64-bit space
    assert(brute.nonEmpty)
    // and the packed hash genuinely uses the high bits (sign bit set
    // for some doc — OR-packing handles bit 63)
    val anyNegative = sims.select(col("simhash")).as[Long].collect().exists(_ < 0)
    assert(anyNegative, "expected some 64-bit simhash with bit 63 set")
  }

  test("blocked nearPairs rejects maxDist >= blocks (no pigeonhole guarantee)") {
    val sims = Seq((1L, 7L)).toDF("doc_id", "simhash")
    an[IllegalArgumentException] should be thrownBy
      SimHash.nearPairsBlocked(sims, "doc_id", maxDist = 4, blocks = 4)
  }
}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token counting and quality on a known sentence") {
    val df = Seq((1L, "The cat sat on the mat, happily!")).toDF("id", "text")
    val nc = TextFunctions.normalize(col("text"))
    val r = df.select(
      TextFunctions.tokenCount(nc).as("n"),
      TextFunctions.tokenCountBpe(col("text")).as("bpe"),
      TextFunctions.punctRatio(col("text")).as("punct"),
      TextFunctions.langId(nc).as("lang")).collect().head
    r.getAs[Int]("n") shouldBe 7
    r.getAs[Int]("bpe") shouldBe 9 // 7 words + ',' + '!'
    r.getAs[Double]("punct") shouldBe 0.0625 // round(2/32, 4)
    r.getAs[String]("lang") shouldBe "en" // 'the' x2, 'on'
  }

  test("langId picks the dominant stopword language, und when none") {
    val df = Seq(
      (1L, "el perro y la casa de un amigo"),
      (2L, "zzz qqq xxx")).toDF("id", "text")
    val out = df.select(col("id"),
        TextFunctions.langId(TextFunctions.normalize(col("text"))).as("l"))
      .as[(Long, String)].collect().toMap
    out(1L) shouldBe "es"
    out(2L) shouldBe "und"
  }

  test("fingerprint is normalization-invariant") {
    val df = Seq(("A  B", "a b")).toDF("x", "y")
    val r = df.select(
      TextFunctions.fingerprint(TextFunctions.normalize(col("x"))).as("fx"),
      TextFunctions.fingerprint(TextFunctions.normalize(col("y"))).as("fy"))
      .collect().head
    r.getString(0) shouldBe r.getString(1)
  }
}

class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    DupClusters.components(
        nodes.toDF("doc_id"), "doc_id",
        edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  test("chain propagates the min id across the whole component") {
    // 1-2-3-4 is a 3-hop chain: needs multiple propagation rounds
    cc(Seq(1L, 2L, 3L, 4L, 5L), Seq((1L, 2L), (2L, 3L), (3L, 4L))) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L)
  }

  test("separate components keep separate min labels; edge direction irrelevant") {
    cc(Seq(1L, 2L, 3L, 4L, 5L, 6L), Seq((2L, 1L), (5L, 4L), (6L, 4L))) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
  }

  test("no edges: every node is its own singleton cluster") {
    cc(Seq(7L, 8L), Nil) shouldBe Map(7L -> 7L, 8L -> 8L)
  }

  test("cluster sizes summarize the labelling") {
    val comps = DupClusters.components(
      Seq(1L, 2L, 3L).toDF("doc_id"), "doc_id",
      Seq((1L, 2L)).toDF("id_a", "id_b"), "id_a", "id_b")
    DupClusters.clusterSizes(comps)
      .as[(Long, Long)].collect().toSet shouldBe Set((1L, 2L), (3L, 1L))
  }

  private def ccStar(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    DupClusters.componentsAlternating(
        nodes.toDF("doc_id"), "doc_id",
        edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  test("star contraction matches propagation on chains, stars, and singletons") {
    val cases = Seq(
      (Seq(1L, 2L, 3L, 4L, 5L), Seq((1L, 2L), (2L, 3L), (3L, 4L))),
      (Seq(1L, 2L, 3L, 4L, 5L, 6L), Seq((2L, 1L), (5L, 4L), (6L, 4L))),
      (Seq(7L, 8L), Seq.empty[(Long, Long)]),
      // duplicate + reversed + self-loop edges
      (Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 1L), (2L, 2L))))
    cases.foreach { case (ns, es) =>
      withClue(s"nodes=$ns edges=$es: ")(ccStar(ns, es) shouldBe cc(ns, es))
    }
  }

  test("property: star contraction ≡ propagation on random graphs") {
    import org.scalacheck.Gen
    val edgeGen = Gen.zip(Gen.chooseNum(0L, 29L), Gen.chooseNum(0L, 29L))
    checkProp(Gen.listOfN(25, edgeGen), cases = 6) { es =>
      val ns = (0L until 30L)
      ccStar(ns, es) shouldBe cc(ns, es)
    }
  }

  test("signature contraction matches the uncontracted labelling, wide dup groups included") {
    // 3 signature groups: sig 100 duplicated 6-wide, sig 101 within
    // Hamming 1 of it (one flipped low bit — same top-16 block), sig
    // 1L<<40 far away; plus a doc with NO signature row (token-less
    // analogue) that must label itself.
    val sims = (
      (1L to 6L).map(i => (i, 100L)) ++
        Seq((7L, 101L), (8L, 1L << 40), (9L, (1L << 40) | 3L))
      ).toDF("doc_id", "simhash")
    val nodes = (1L to 10L).toDF("doc_id")
    val pairsOf = (reps: org.apache.spark.sql.DataFrame) =>
      SimHash.nearPairs(reps, "doc_id", maxDist = 2)
    val contracted = DupClusters.componentsContracted(
        nodes, "doc_id", sims, "simhash", pairsOf)
      .as[(Long, Long)].collect().toMap
    val plain = DupClusters.componentsAlternating(
        nodes, "doc_id",
        SimHash.nearPairs(sims, "doc_id", maxDist = 2), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    contracted shouldBe plain
    contracted(6L) shouldBe 1L // wide group collapses to its min
    contracted(7L) shouldBe 1L // near signature joins through the rep
    contracted(9L) shouldBe 8L // separate far component
    contracted(10L) shouldBe 10L // no signature: labels itself
  }

  test("property: signature contraction ≡ uncontracted on random signature sets") {
    import org.scalacheck.Gen
    // few distinct signatures over many docs => wide groups + near
    // collisions; signatures drawn from two Hamming-close families
    val sigGen = Gen.oneOf(Seq(0L, 1L, 3L, 1L << 20, (1L << 20) | 1L, 1L << 33))
    checkProp(Gen.listOfN(24, sigGen), cases = 5) { sigs =>
      val sims = sigs.zipWithIndex.map { case (sg, i) => (i.toLong, sg) }
        .toDF("doc_id", "simhash")
      val ns = (0L until 24L).toDF("doc_id")
      val a = DupClusters.componentsContracted(ns, "doc_id", sims, "simhash",
          reps => SimHash.nearPairs(reps, "doc_id", maxDist = 2))
        .as[(Long, Long)].collect().toMap
      val b = DupClusters.componentsAlternating(ns, "doc_id",
          SimHash.nearPairs(sims, "doc_id", maxDist = 2), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      a shouldBe b
    }
  }

  test("keepBest keeps the highest score per cluster, ties to the lowest id") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (4L, 0.5), (5L, 0.1), (6L, 0.1))
      .toDF("doc_id", "quality")
    DupClusters.keepBest(comps, scores, "doc_id", "quality")
      .as[(Long, Long, Double, Long)].collect().toSet shouldBe
      // cluster 1: 2 and 3 tie at 0.9 -> lowest id 2; singleton 4
      // keeps itself; cluster 5: tie at 0.1 -> 5
      Set((1L, 2L, 0.9, 3L), (4L, 4L, 0.5, 1L), (5L, 5L, 0.1, 2L))
  }

  test("keepPreferred: source priority beats quality, quality breaks ties in-tier") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_id")
    val attrs = Seq(
      // cluster 1: doc 1 is highest quality but tier 0; doc 3 wins on tier
      (1L, "crawl", 0, 0.9), (2L, "curated", 2, 0.3), (3L, "curated", 2, 0.7),
      // cluster 4: same tier -> quality decides
      (4L, "crawl", 0, 0.2), (5L, "crawl", 0, 0.8))
      .toDF("doc_id", "source", "priority", "quality")
    DupClusters.keepPreferred(comps, attrs, "doc_id",
        Seq(col("priority").desc, col("quality").desc, col("doc_id")),
        Seq("source", "priority", "quality"))
      .as[(Long, Long, String, Int, Double, Long)].collect().toSet shouldBe
      Set((1L, 3L, "curated", 2, 0.7, 3L), (4L, 5L, "crawl", 0, 0.8, 2L))
  }

  test("keepPreferred with (score desc, id) preference is exactly keepBest") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 0.4), (2L, 0.4), (3L, 0.6)).toDF("doc_id", "quality")
    val a = DupClusters.keepPreferred(comps, scores, "doc_id",
        Seq(col("quality").desc, col("doc_id")), Seq("quality"))
      .as[(Long, Long, Double, Long)].collect().toSet
    val b = DupClusters.keepBest(comps, scores, "doc_id", "quality")
      .as[(Long, Long, Double, Long)].collect().toSet
    a shouldBe b
  }

  test("a 200-node chain converges in O(log n) star rounds (propagation would need 200)") {
    val ns = (0L until 200L)
    val es = (0L until 199L).map(i => (i, i + 1))
    // maxRounds = 12 ≈ 2·log2(200): propagation at this budget throws
    val got = DupClusters.componentsAlternating(
        ns.toDF("doc_id"), "doc_id",
        es.toDF("id_a", "id_b"), "id_a", "id_b", maxRounds = 12)
      .as[(Long, Long)].collect()
    got.length shouldBe 200
    got.foreach { case (_, lbl) => lbl shouldBe 0L }
    intercept[IllegalStateException] {
      DupClusters.components(
        ns.toDF("doc_id"), "doc_id",
        es.toDF("id_a", "id_b"), "id_a", "id_b", maxRounds = 12)
    }
  }
}

class ProbeCandidatesSpec extends SparkSpec {
  import spark.implicits._

  test("probe finds cross-batch near-dups only, never probe-probe pairs") {
    val old = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text about spark engines and shuffles"))
      .toDF("doc_id", "text")
    val neu = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (11L, "the quick brown fox jumps over the lazy dog"), // dup of 1 AND 10
      (12L, "zzz entirely novel content qqq www eee rrr"))
      .toDF("doc_id", "text")
    val norm = graft.functions.TextFunctions.normalize(col("text"))
    val index = MinHashLSH.bandedIndex(old, "doc_id", norm)
    val out = MinHashLSH.probeCandidates(index, neu, "doc_id", norm)
      .as[(Long, Long)].collect().toSet
    // 10 and 11 match stored doc 1; the 10-11 probe-probe pair is NOT
    // this operator's job (it belongs to the batch's own candidatePairs)
    out shouldBe Set((1L, 10L), (1L, 11L))
  }

  test("witness cap bounds candidates per bucket but never hides a duplicate") {
    // 50 identical index docs share every bucket; a capped probe must
    // still flag the probe doc as a duplicate, pairing it only with
    // the SMALLEST index ids (the kept survivors in dedup semantics)
    val txt = "the quick brown fox jumps over the lazy dog"
    val old = (1L to 50L).map(i => (i, txt)).toDF("doc_id", "text")
    val neu = Seq((100L, txt)).toDF("doc_id", "text")
    val norm = graft.functions.TextFunctions.normalize(col("text"))
    val index = MinHashLSH.bandedIndex(old, "doc_id", norm)
    val bands = MinHashLSH.bandedIndex(neu, "doc_id", norm)
    val capped = MinHashLSH.probeCandidatesBanded(index, bands, "doc_id",
        maxIndexPerBucket = 8)
      .as[(Long, Long)].collect().toSet
    capped should not be empty
    capped.size should be <= 8 // at most cap witnesses survive
    capped shouldBe (1L to 8L).map(i => (i, 100L)).toSet // smallest ids kept
    // uncapped default returns every witness
    MinHashLSH.probeCandidatesBanded(index, bands, "doc_id")
      .count() shouldBe 50L
  }

  test("probe against an empty index yields nothing") {
    val old = Seq((1L, "abc")).toDF("doc_id", "text").filter(col("doc_id") < 0)
    val neu = Seq((10L, "abc def ghi jkl")).toDF("doc_id", "text")
    val norm = graft.functions.TextFunctions.normalize(col("text"))
    MinHashLSH.probeCandidates(
      MinHashLSH.bandedIndex(old, "doc_id", norm), neu, "doc_id", norm)
      .count() shouldBe 0L
  }
}

class DupClustersEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("empty node set returns an empty labelling, not an NPE") {
    val nodes = Seq(1L).toDF("doc_id").filter(col("doc_id") < 0)
    val edges = Seq((1L, 2L)).toDF("id_a", "id_b").filter(col("id_a") < 0)
    DupClusters.components(nodes, "doc_id", edges, "id_a", "id_b")
      .count() shouldBe 0L
  }

  test("exhausting maxRounds on a long chain fails loudly, never silently wrong") {
    // 0-1-2-...-6 chain needs ~6 rounds; cap at 2 must throw
    val nodes = (0L to 6L).toDF("doc_id")
    val edges = (0L until 6L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    an[IllegalStateException] should be thrownBy {
      DupClusters.components(nodes, "doc_id", edges, "id_a", "id_b",
        maxRounds = 2).count()
    }
  }
}
