package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The stored prefix index screens batches EXACTLY (every J >= tau
  * corpus partner found, none invented), advances O(new) on corpus
  * appends, and — the index's defining subtlety — stays exact under
  * the FROZEN token order even when post-append frequencies would
  * sort tokens differently and the batch carries tokens the frozen
  * order has never seen.
  */
class PrefixStoreSpec extends SparkSpec {
  import spark.implicits._

  private def brute(corpus: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame, tauNum: Int, tauDen: Int) = {
    val sz = org.apache.spark.sql.functions.size _
    def sets(df: org.apache.spark.sql.DataFrame, idAs: String, tAs: String) =
      df.select(col("doc_id").as(idAs), array_distinct(split(
        graft.functions.TextFunctions.normalize(col("text")), " ")).as(tAs))
    val inter = sz(array_intersect(col("ta"), col("tb")))
    val union = sz(col("ta")) + sz(col("tb")) - inter
    sets(corpus, "dup_id", "ta").crossJoin(sets(batch, "new_id", "tb"))
      .where(inter * tauDen >= union * tauNum)
      .select(col("new_id"), col("dup_id"),
        round(inter.cast("double") / union, 4).as("jaccard"))
  }

  test("screen finds exactly the brute-force partners; unseen tokens handled") {
    val sf = Files.createTempDirectory("pstore").toString
    val corpus = s"$sf/documents.parquet"
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "completely different content here now"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    // batch doc 10 is a near-dup of 1 (one token changed); doc 11
    // carries only NEVER-SEEN tokens (frozen order assigns df 0)
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon theta"),
      (11L, "totally novel vocabulary outside corpus")).toDF("doc_id", "text")
    val got = PrefixStore.screen(spark, sf, "documents", batch, "doc_id", 7, 10)
    assertSameRows(got, brute(spark.read.parquet(corpus), batch, 7, 10))
    got.select("new_id").as[Long].collect().toSet shouldBe Set(10L)
  }

  test("append advances O(new) under the frozen order; exactness survives drift") {
    val sf = Files.createTempDirectory("pstore-inc").toString
    val corpus = s"$sf/documents.parquet"
    Seq(
      (1L, "red green blue yellow purple orange"),
      (2L, "red green blue yellow purple pink"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    PrefixStore.screen(spark, sf, "documents",
      Seq((90L, "x y z")).toDF("doc_id", "text"), "doc_id", 9, 10).count()

    // record base snapshot files, then append docs whose tokens would
    // REORDER the df table if it were rebuilt (many repeats of 'red')
    val root = java.nio.file.Paths.get(
      graft.sources.ArtifactStore.root,
      graft.sources.ArtifactStore.pathKey(corpus) + "_prefix2_9_10")
    def baseFiles = {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.contains("/base/") &&
          p.toString.endsWith(".parquet"))
        .toArray.toSeq.map(_.toString).sorted
      finally s.close()
    }
    val before = baseFiles
    Seq(
      (3L, "red red1 red2 red3 red4 red5"),
      (4L, "red red1 red2 red3 red4 red6"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(corpus)

    val batch = Seq(
      (10L, "red green blue yellow purple maroon"), // near-dup of 1 and 2
      (11L, "red red1 red2 red3 red4 red7")) // near-dup of 3 and 4 (appended)
      .toDF("doc_id", "text")
    val got = PrefixStore.screen(spark, sf, "documents", batch, "doc_id", 7, 10)
    assertSameRows(got, brute(spark.read.parquet(corpus), batch, 7, 10))
    got.select("new_id", "dup_id").as[(Long, Long)].collect().toSet shouldBe
      Set((10L, 1L), (10L, 2L), (11L, 3L), (11L, 4L))
    // the advance appended deltas; base files of the additive pieces
    // are untouched (O(new) contract)
    baseFiles shouldBe before
  }

  test("store-served pairs and clusters equal the inline forms") {
    val sf = Files.createTempDirectory("pstore-whole").toString
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),
      (3L, "a b c d e f g h k l"),
      (4L, "totally different things here now then"),
      (5L, "a b c d e f g h i j"),
      (6L, "x y z w v u t s r q")).toDF("doc_id", "text")
    docs.coalesce(1).write.parquet(s"$sf/documents.parquet")
    assertSameRows(
      PrefixStore.similarPairs(spark, sf, "documents", 7, 10),
      PrefixJoin.similarPairs(docs, "doc_id", col("text"), 7, 10))
    assertSameRows(
      PrefixStore.clusters(spark, sf, "documents", 7, 10),
      PrefixJoin.clusters(docs, "doc_id", col("text"), 7, 10))
  }

  test("pairs+labels advance O(affected): a new doc MERGES two old clusters") {
    val sf = Files.createTempDirectory("pstore-merge").toString
    val corpus = s"$sf/documents.parquet"
    // two 2-doc clusters + a singleton at tau = 1/3
    Seq(
      (1L, "a b c d"), (2L, "a b c e"), // J = 0.6
      (4L, "p q r s"), (5L, "p q r t"), // J = 0.6
      (6L, "m n o u"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    // first serve = full build
    PrefixStore.clusters(spark, sf, "documents", 1, 3).count()

    val root = java.nio.file.Paths.get(
      graft.sources.ArtifactStore.root,
      graft.sources.ArtifactStore.pathKey(corpus) + "_prefix2_1_3")
    def baseFiles = {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.contains("/base/") &&
          p.toString.endsWith(".parquet"))
        .toArray.toSeq.map(_.toString).sorted
      finally s.close()
    }
    val before = baseFiles

    // 7 bridges the two clusters at the EXACT boundary (J = 2/6 = 1/3
    // with each of 1,2,4,5 — integer arithmetic must keep it);
    // 8 is fresh novel content (fast-path shape for its subgraph);
    // 9 is doc 6's token set in a DIFFERENT order (canonical fp must
    // contract them; J = 1 pair)
    Seq((7L, "a b p q"), (8L, "zz yy xx ww"), (9L, "u o n m"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(corpus)

    val all = spark.read.parquet(corpus)
    assertSameRows(
      PrefixStore.similarPairs(spark, sf, "documents", 1, 3),
      PrefixJoin.similarPairs(all, "doc_id", col("text"), 1, 3))
    assertSameRows(
      PrefixStore.clusters(spark, sf, "documents", 1, 3),
      PrefixJoin.clusters(all, "doc_id", col("text"), 1, 3))
    // the merged labelling: one cluster {1,2,4,5,7}, {6,9}, {8}
    PrefixStore.clusters(spark, sf, "documents", 1, 3)
      .as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 1L, 7L -> 1L,
        6L -> 6L, 9L -> 6L, 8L -> 8L)
    // advance wrote deltas only — every base snapshot untouched
    baseFiles shouldBe before

    // compaction folds to a plain base; results unchanged
    PrefixStore.compact(spark, corpus, 1, 3)
    assertSameRows(
      PrefixStore.clusters(spark, sf, "documents", 1, 3),
      PrefixJoin.clusters(all, "doc_id", col("text"), 1, 3))
    assertSameRows(
      PrefixStore.similarPairs(spark, sf, "documents", 1, 3),
      PrefixJoin.similarPairs(all, "doc_id", col("text"), 1, 3))
  }

  test("fresh-content increment takes the fast path: no old row rewritten") {
    val sf = Files.createTempDirectory("pstore-fresh").toString
    val corpus = s"$sf/documents.parquet"
    Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i k"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    PrefixStore.clusters(spark, sf, "documents", 7, 10).count()
    Seq((3L, "entirely novel words appear here"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(corpus)
    val got = PrefixStore.clusters(spark, sf, "documents", 7, 10)
      .as[(Long, Long)].collect().toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 3L)
    // the labels delta of the fresh increment carries ONLY the new doc
    val root = java.nio.file.Paths.get(
      graft.sources.ArtifactStore.root,
      graft.sources.ArtifactStore.pathKey(corpus) + "_prefix2_7_10")
    val deltaRows = spark.read
      .parquet(root.resolve("labels").resolve("delta").toString)
      .select("doc_id").as[Long].collect().toSeq
    deltaRows shouldBe Seq(3L)
  }

  test("crash replay: a half-committed advance re-runs into the same generation") {
    val sf = Files.createTempDirectory("pstore-crash").toString
    val corpus = s"$sf/documents.parquet"
    Seq((1L, "a b c d"), (2L, "a b c e"), (4L, "p q r s"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    PrefixStore.clusters(spark, sf, "documents", 1, 3).count()

    val statePath = java.nio.file.Paths.get(
      graft.sources.ArtifactStore.root,
      graft.sources.ArtifactStore.pathKey(corpus) + "_prefix2_1_3", "state")
    val preAppendState = java.nio.file.Files.readString(statePath)

    Seq((7L, "a b p q")).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(corpus)
    PrefixStore.clusters(spark, sf, "documents", 1, 3).count()

    // simulate the crash window: gen deltas landed but the ledger
    // commit (the LAST step) did not — restore the pre-append ledger
    java.nio.file.Files.writeString(statePath, preAppendState)

    // the replayed reconcile reads views that EXCLUDE the half-written
    // generation, recomputes identical content into the SAME
    // deterministic gen partition, and commits the ledger — results
    // equal a clean run, nothing double-counted
    val all = spark.read.parquet(corpus)
    assertSameRows(
      PrefixStore.clusters(spark, sf, "documents", 1, 3),
      PrefixJoin.clusters(all, "doc_id", col("text"), 1, 3))
    assertSameRows(
      PrefixStore.similarPairs(spark, sf, "documents", 1, 3),
      PrefixJoin.similarPairs(all, "doc_id", col("text"), 1, 3))
    // each key exactly once after LWW resolution
    PrefixStore.clusters(spark, sf, "documents", 1, 3).count() shouldBe 4
  }

  test("containment screen catches subset docs symmetric Jaccard misses") {
    val sf = Files.createTempDirectory("pstore-cont").toString
    val corpus = s"$sf/documents.parquet"
    // corpus doc 1 is LARGE; batch doc 10 is a strict subset of it
    Seq(
      (1L, "a b c d e f g h i j k l m n o p q r s t"),
      (2L, "unrelated words in this other corpus doc"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    val batch = Seq(
      (10L, "a b c d e"), // contained in 1; J = 5/20 = 0.25
      (11L, "a b z9 z8 z7")).toDF("doc_id", "text") // only 2/5 contained
    val got = PrefixStore.screenContainment(
        spark, sf, "documents", batch, "doc_id", 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.toSeq shouldBe Seq((10L, 1L, 1.0))
    // the symmetric screen at the same tau finds nothing
    PrefixStore.screen(spark, sf, "documents", batch, "doc_id", 9, 10)
      .count() shouldBe 0L
    // brute-force equality at a lower tau (multiple partial containments)
    val sz = org.apache.spark.sql.functions.size _
    def sets(df: org.apache.spark.sql.DataFrame, idAs: String, tAs: String) =
      df.select(col("doc_id").as(idAs), array_distinct(split(
        graft.functions.TextFunctions.normalize(col("text")), " ")).as(tAs))
    val inter = sz(array_intersect(col("tb"), col("ta")))
    val brute = sets(spark.read.parquet(corpus), "dup_id", "ta")
      .crossJoin(sets(batch, "new_id", "tb"))
      .where(inter * 10 >= sz(col("tb")) * 4)
      .select(col("new_id"), col("dup_id"),
        round(inter.cast("double") / sz(col("tb")), 4).as("containment"))
    assertSameRows(
      PrefixStore.screenContainment(spark, sf, "documents", batch, "doc_id", 4, 10),
      brute)
  }

  test("non-append corpus change triggers a full rebuild (fresh frozen order)") {
    val sf = Files.createTempDirectory("pstore-rb").toString
    val corpus = s"$sf/documents.parquet"
    Seq((1L, "one two three four five six"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    PrefixStore.screen(spark, sf, "documents",
      Seq((90L, "x y z")).toDF("doc_id", "text"), "doc_id", 9, 10).count()
    // overwrite = regrow in place
    Seq((5L, "six seven eight nine ten eleven"))
      .toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(corpus)
    val batch = Seq((10L, "six seven eight nine ten twelve")).toDF("doc_id", "text")
    val got = PrefixStore.screen(spark, sf, "documents", batch, "doc_id", 7, 10)
    got.select("new_id", "dup_id").as[(Long, Long)].collect().toSet shouldBe
      Set((10L, 5L))
  }
}
