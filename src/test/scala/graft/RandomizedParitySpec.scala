package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Randomized differential parity harness — the round-8 verdict's
  * prescription: the operator families whose correctness rests on a
  * FILTER-SOUNDNESS theorem (prefix/positional/containment filters,
  * pigeonhole segment and block dictionaries, bucketized range
  * algebra, bloom negatives) are checked engine ≡ naive-oracle on
  * FRESH seeded corpora every run, not just on the fixed sf0.01
  * fixtures. Every generator is driven by an explicit seed carried
  * into the failure message, so a red run replays exactly.
  *
  * The naive oracles here are deliberately brute force (cross join +
  * predicate): slow but obviously correct — the same discipline as
  * the registered d23/d27 DuckDB oracles, applied adversarially.
  */
class RandomizedParitySpec extends SparkSpec {
  import spark.implicits._

  private val seeds = Seq(101L, 202L, 303L)

  private def words(rnd: scala.util.Random, vocab: IndexedSeq[String],
      lo: Int, hi: Int): String =
    Seq.fill(lo + rnd.nextInt(hi - lo + 1))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")

  private def docCorpus(seed: Long, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 25).map(i => s"w$i")
    // half fresh docs, half near-dup perturbations of earlier docs
    val base = (0 until n).map(i => (i.toLong, words(rnd, vocab, 4, 12)))
    val persed = base.filter(_._1 % 2 == 0).map { case (i, s) =>
      val toks = s.split(" ").toSeq
      val drop = rnd.nextInt(toks.size)
      (i + 10000L, rnd.shuffle(toks.take(drop) ++ toks.drop(drop + 1) ++
        (if (rnd.nextBoolean()) Seq(vocab(rnd.nextInt(vocab.size))) else Nil))
        .mkString(" "))
    }
    (base ++ persed).toDF("doc_id", "text")
  }

  private def tokSets(df: DataFrame, idAs: String, tAs: String): DataFrame =
    df.select(col("doc_id").as(idAs), array_distinct(split(
      graft.functions.TextFunctions.normalize(col("text")), " ")).as(tAs))

  test("prefix-join family: exact word-Jaccard pairs vs brute force") {
    for (seed <- seeds; (tn, td) <- Seq((1, 2), (7, 10))) {
      val docs = docCorpus(seed, 30).localCheckpoint()
      val inter = F.size(array_intersect(col("ta"), col("tb")))
      val union = F.size(col("ta")) + F.size(col("tb")) - inter
      val brute = tokSets(docs, "id_a", "ta")
        .crossJoin(tokSets(docs, "id_b", "tb"))
        .where(col("id_a") < col("id_b"))
        .where(inter * td >= union * tn)
        .select(col("id_a"), col("id_b"),
          round(inter.cast("double") / union, 4).as("jaccard"))
      withClue(s"seed=$seed tau=$tn/$td: ") {
        assertSameRows(
          graft.dedup.PrefixJoin.similarPairs(docs, "doc_id", col("text"), tn, td),
          brute)
      }
    }
  }

  test("containment-screen family: stored-index screen vs brute force") {
    for (seed <- seeds) {
      val sf = Files.createTempDirectory(s"parity-cont-$seed").toString
      val all = docCorpus(seed, 24)
      all.filter(col("doc_id") < 5000).coalesce(1)
        .write.parquet(s"$sf/documents.parquet")
      val batch = all.filter(col("doc_id") >= 5000).localCheckpoint()
      val inter = F.size(array_intersect(col("tb"), col("ta")))
      val brute = tokSets(spark.read.parquet(s"$sf/documents.parquet"),
          "dup_id", "ta")
        .crossJoin(tokSets(batch, "new_id", "tb"))
        .where(inter * 10 >= F.size(col("tb")) * 6)
        .select(col("new_id"), col("dup_id"),
          round(inter.cast("double") / F.size(col("tb")), 4).as("containment"))
      withClue(s"seed=$seed: ") {
        assertSameRows(
          graft.dedup.PrefixStore.screenContainment(
            spark, sf, "documents", batch, "doc_id", 6, 10),
          brute)
      }
    }
  }

  test("edit-join family: segment-blocked levenshtein vs brute force") {
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val alpha = "abcde"
      val strs = (0 until 60).map { i =>
        (i.toLong, (0 until 3 + rnd.nextInt(8))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      }.toDF("sid", "s").localCheckpoint()
      val brute = strs.select(col("sid").as("id_a"), col("s").as("s_a"))
        .crossJoin(strs.select(col("sid").as("id_b"), col("s").as("s_b")))
        .where(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
        .where(col("dist") <= 2)
        .select("id_a", "id_b", "dist")
      withClue(s"seed=$seed: ") {
        assertSameRows(
          graft.dedup.EditJoin.similarPairs(strs, "sid", col("s"), 2),
          brute)
      }
    }
  }

  test("simhash pigeonhole family: blocked near-pairs vs brute Hamming") {
    for (seed <- seeds) {
      val docs = docCorpus(seed, 40)
      val sims = graft.dedup.SimHash.compute(docs, "doc_id",
        graft.functions.TextFunctions.normalize(col("text")))
        .localCheckpoint()
      val brute = sims.select(col("doc_id").as("id_a"), col("simhash").as("ha"))
        .crossJoin(sims.select(col("doc_id").as("id_b"), col("simhash").as("hb")))
        .where(col("id_a") < col("id_b"))
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
        .where(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
      withClue(s"seed=$seed: ") {
        assertSameRows(
          graft.dedup.SimHash.nearPairsBlocked(sims, "doc_id", maxDist = 3)
            .select(least(col("id_a"), col("id_b")).as("id_a"),
              greatest(col("id_a"), col("id_b")).as("id_b"), col("hamming")),
          brute)
      }
    }
  }

  test("span-dedup family: earliest-occurrence stats vs independent min-join") {
    for (seed <- seeds) {
      val docs = docCorpus(seed, 25).localCheckpoint()
      val n = 3
      // independent oracle: explode spans, elect the global earliest
      // occurrence per span STRING via a groupBy-min + join (no
      // packed-long ordering, no window, no hashing)
      val toks = graft.functions.TextFunctions.tokens(
        graft.functions.TextFunctions.normalize(col("text")))
      val occ = docs.select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"),
          explode(sequence(lit(1), greatest(F.size(col("t")) - (n - 1), lit(1))))
            .as("pos"), col("t"))
        .select(col("doc_id"), col("pos"),
          array_join(slice(col("t"), col("pos"), lit(n)), " ").as("span"))
      val firsts = occ.groupBy("span")
        .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
      val brute = occ.join(firsts, "span")
        .withColumn("_dup",
          when(col("f.doc_id") =!= col("doc_id") ||
            col("f.pos") =!= col("pos"), 1L).otherwise(0L))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"), sum("_dup").as("dup_spans"))
        .select(col("doc_id"), col("n_spans"), col("dup_spans"),
          round(col("dup_spans") / col("n_spans"), 4).as("dup_ratio"))
      withClue(s"seed=$seed: ") {
        assertSameRows(
          graft.dedup.SpanDedup.spanStats(docs, "doc_id", col("text"), n),
          brute)
      }
    }
  }

  test("range-join family: bucketized point-in-interval vs naive filter") {
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val points = (0 until 120).map(i =>
        (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong))
        .toDF("pid", "k", "v").localCheckpoint()
      val ivs = (0 until 40).map { i =>
        val s = rnd.nextInt(1000) - 20
        (i.toLong, rnd.nextInt(4).toLong, s.toLong,
          (s + rnd.nextInt(120) - 10).toLong) // some degenerate e <= s
      }.toDF("iid", "k", "s", "e").localCheckpoint()
      val brute = points.join(ivs, "k")
        .where(col("s") <= col("v") && col("v") < col("e"))
        .select("pid", "k", "v", "iid", "s", "e")
      withClue(s"seed=$seed: ") {
        assertSameRows(
          graft.operators.RangeJoin.join(points, ivs, Seq("k"),
              "v", "s", "e", bucketWidth = 64)
            .select("pid", "k", "v", "iid", "s", "e"),
          brute)
      }
    }
  }

  test("interval-join family: canonical-bucket overlap vs naive filter") {
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      def ivs(m: Int, pre: String) = (0 until m).map { i =>
        val s = rnd.nextInt(500).toLong
        (i.toLong, rnd.nextInt(3).toLong, s, s + 1 + rnd.nextInt(90))
      }.toDF(s"${pre}id", "k", s"${pre}s", s"${pre}e").localCheckpoint()
      val l = ivs(35, "l")
      val r = ivs(35, "r")
      val brute = l.join(r, "k")
        .where(col("ls") < col("re") && col("rs") < col("le"))
        .select("lid", "k", "ls", "le", "rid", "rs", "re")
      withClue(s"seed=$seed: ") {
        assertSameRows(
          graft.operators.RangeJoin.intervalJoin(l, r, Seq("k"),
              "ls", "le", "rs", "re", bucketWidth = 32)
            .select("lid", "k", "ls", "le", "rid", "rs", "re"),
          brute)
      }
    }
  }

  test("as-of family: window union vs naive latest-at-or-before") {
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val left = (0 until 80).map(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(300).toLong))
        .toDF("lid", "k", "ts").localCheckpoint()
      // unique (k, ts) on the right: equal-ts right rows are
      // tie-broken nondeterministically by ANY as-of engine
      val right = (0 until 60).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(300).toLong, s"p$i"))
        .distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
        .toDF("k", "ts", "payload").localCheckpoint()
      // the <= predicate must sit INSIDE the outer join condition or
      // left rows whose every partner is in the future vanish instead
      // of surfacing with a null payload
      val brute = left.join(
          right.select(col("k").as("rk"), col("ts").as("rts"), col("payload")),
          col("k") === col("rk") && col("rts") <= col("ts"), "left")
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("lid").orderBy(col("rts").desc_nulls_last)))
        .where(col("_rn") === 1)
        .select(col("lid"), col("k"), col("ts"),
          when(col("rts").isNotNull, col("payload")).as("payload"))
      withClue(s"seed=$seed: ") {
        assertSameRows(
          graft.operators.AsOfJoin.asOf(left, right, Seq("k"), "ts"),
          brute)
      }
    }
  }

  test("bloom family: stacked filter negatives vs exact anti-join") {
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val seen = (0 until 300).map(i => (i.toLong, s"t${rnd.nextInt(400)}"))
        .toDF("rid", "fp").localCheckpoint()
      val batch = (0 until 150).map(i =>
        (1000L + i, s"t${rnd.nextInt(600)}")).toDF("rid", "fp")
        .localCheckpoint()
      val brute = batch.join(seen.select("fp").distinct(), Seq("fp"), "left_anti")
      withClue(s"seed=$seed: ") {
        assertSameRows(
          graft.dedup.BloomDedup.newRowsStacked(batch, seen, "fp",
            expectedItems = 400, stacks = 4),
          brute)
      }
    }
  }

  test("lww-merge family: union+window merge vs naive latest-wins") {
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      // overlapping key spaces, colliding versions (the tie case:
      // the INCUMBENT must win a version tie)
      def side(n: Int, tag: String) = (0 until n).map(i =>
        (s"k${rnd.nextInt(12)}", rnd.nextInt(5).toLong, s"$tag$i"))
      val dest = side(25, "d").groupBy(_._1).map(_._2.head).toSeq
        .toDF("id", "version", "payload").localCheckpoint()
      val inc = side(25, "i").groupBy(_._1).map(_._2.head).toSeq
        .toDF("id", "version", "payload").localCheckpoint()
      val brute = dest.withColumn("_pri", lit(1))
        .unionByName(inc.withColumn("_pri", lit(0)))
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("id")
            .orderBy(col("version").desc, col("_pri").desc)))
        .where(col("_rn") === 1).drop("_rn", "_pri")
      withClue(s"seed=$seed: ") {
        assertSameRows(
          graft.operators.LwwMerge.merge(dest, inc, Seq("id"), "version"),
          brute)
      }
    }
  }

  test("topk-aggregator family: bounded heap vs sort-limit per group") {
    import org.apache.spark.sql.functions.udaf
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      // distinct scores per group so the (score desc, id asc) order
      // is unambiguous for both forms
      val rows = (0 until 200).map(i =>
        (rnd.nextInt(6).toLong, i.toLong, rnd.nextInt(100000) / 7.0))
        .groupBy(t => (t._1, t._3)).map(_._2.head).toSeq
        .toDF("g", "id", "score").localCheckpoint()
      val k = 5
      val topk = udaf(new graft.plans.TopKAggregator(k),
        org.apache.spark.sql.Encoders.product[graft.plans.Scored])
      val viaHeap = rows
        .groupBy("g").agg(topk(col("id"), col("score")).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("p0", "s")))
        .select(col("g"), (col("p0") + 1).as("rank"),
          col("s.id").as("id"), col("s.score").as("score"))
      val viaWindow = rows
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("g")
            .orderBy(col("score").desc, col("id"))))
        .where(col("rank") <= k)
        .select("g", "rank", "id", "score")
      withClue(s"seed=$seed: ") { assertSameRows(viaHeap, viaWindow) }
    }
  }

  test("pair-generation family: bucketized within-key pairs vs brute") {
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 90).map(i =>
        (i.toLong, rnd.nextInt(8).toLong)).toDF("mid", "g").localCheckpoint()
      // pairsWithin emits only (a, b); each mid lives in one group,
      // so the pair set alone determines parity
      val brute = rows.select(col("g"), col("mid").as("a"))
        .join(rows.select(col("g"), col("mid").as("b")), "g")
        .where(col("a") < col("b"))
        .select("a", "b")
      withClue(s"seed=$seed: ") {
        assertSameRows(
          graft.dedup.PairGen.pairsWithin(rows, Seq("g"), col("mid"))
            .select("a", "b"),
          brute)
      }
    }
  }

  test("sketch-merge family: chunked partial folds vs single whole-corpus build") {
    import graft.sketch.{CountMin, HyperLogLog, LogHistogram}
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val corpus = docCorpus(seed, 60)
        .withColumn("source",
          concat(lit("s"), pmod(col("doc_id"), lit(3))))
        .localCheckpoint()
      val toks = corpus.select(col("source"), explode(split(
        graft.functions.TextFunctions.normalize(col("text")), " ")).as("term"))
        .localCheckpoint()
      val lens = corpus.select(
        F.size(split(col("text"), " ")).cast("double").as("v"))
        .localCheckpoint()
      // random disjoint chunking — the generations ingest produces
      val nChunks = 2 + rnd.nextInt(3)
      val cut = col("doc_id") % nChunks
      val tokChunks = (0 until nChunks).map(i =>
        corpus.where(cut === i).select(col("source"), explode(split(
          graft.functions.TextFunctions.normalize(col("text")), " "))
          .as("term")))
      val lenChunks = (0 until nChunks).map(i =>
        corpus.where(cut === i).select(
          F.size(split(col("text"), " ")).cast("double").as("v")))
      withClue(s"seed=$seed chunks=$nChunks: ") {
        // CountMin: counters sum
        assertSameRows(
          CountMin.merge(tokChunks.map(c =>
            CountMin.build(c, col("term"), depth = 3, width = 64))),
          CountMin.build(toks, col("term"), depth = 3, width = 64))
        // HyperLogLog: registers max
        assertSameRows(
          HyperLogLog.merge(tokChunks.map(c =>
            HyperLogLog.build(c, col("term"), keys = Seq("source"))),
            keys = Seq("source")),
          HyperLogLog.build(toks, col("term"), keys = Seq("source")))
        // LogHistogram: bins sum
        assertSameRows(
          LogHistogram.merge(lenChunks.map(c => LogHistogram.build(c, col("v")))),
          LogHistogram.build(lens, col("v")))
      }
    }
  }

  test("triangle family: degree-oriented count vs in-memory brute enumeration") {
    for (seed <- seeds; density <- Seq(0.08, 0.35)) {
      val rnd = new scala.util.Random(seed)
      val n = 24 + rnd.nextInt(16)
      // Erdos-Renyi plus a forced hub (node 0 adjacent to everything)
      // - the degenerate-degree case the orientation exists for
      val pairs = for {
        a <- 0 until n; b <- (a + 1) until n
        if a == 0 || rnd.nextDouble() < density
      } yield (a.toLong, b.toLong)
      val brute = (for {
        (a, b) <- pairs; c <- (b + 1) until n
        if pairs.contains((a, c.toLong)) && pairs.contains((b, c.toLong))
      } yield 1).size.toLong
      val edges = pairs.toDF("a", "b")
      withClue(s"seed=$seed density=$density n=$n edges=${pairs.size}: ") {
        val got = graft.operators.Triangles.count(edges)
          .head.getLong(0)
        assert(got === brute)
        // per-node participation: every triangle credits all three
        // corners; brute recount per node against the operator
        val bruteNode = (for {
          (a, b) <- pairs; c <- (b + 1) until n
          if pairs.contains((a, c.toLong)) && pairs.contains((b, c.toLong))
          v <- Seq(a, b, c.toLong)
        } yield v).groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
        val gotNode = graft.operators.Triangles.perNode(edges)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotNode === bruteNode)
        // caller-supplied degree frame (the q79 single-aggregate
        // path): identical result to the self-computed one
        val deg = edges.select(col("a").as("node"))
          .unionAll(edges.select(col("b").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        val gotNodePre = graft.operators.Triangles
          .perNode(edges, Some(deg))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotNodePre === bruteNode)
      }
    }
  }
}
