package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The stored edit-distance screen finds exactly the brute-force
  * partners — including corpus partners LONGER than the batch string
  * (the orientation the stored probe piece exists for) — advances
  * O(new) on appends, and rebuilds on a non-append change.
  */
class EditStoreSpec extends SparkSpec {
  import spark.implicits._

  private def brute(corpus: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame, k: Int) =
    corpus.select(col("sid").as("dup_id"), col("name").as("s_d"))
      .crossJoin(batch.select(col("sid").as("new_id"), col("name").as("s_n")))
      .withColumn("dist", levenshtein(col("s_n"), col("s_d")).cast("long"))
      .where(col("dist") <= k)
      .select("new_id", "dup_id", "dist")

  test("screen equals brute force both ways in length; O(new) append") {
    val base = Files.createTempDirectory("editstore")
    val corpus = base.resolve("names.parquet").toString
    Seq((1L, "walter"), (2L, "walther"), (3L, "zed"), (4L, "completely"))
      .toDF("sid", "name").coalesce(1).write.parquet(corpus)
    val batch = Seq(
      (10L, "walterz"), // dist 1 to walter (longer probe, shorter corpus)
      (11L, "walt"), // dist 2 to walter — corpus partner LONGER
      (12L, "ze"), // dist 1 to zed — corpus partner LONGER
      (13L, "nothing-close")).toDF("sid", "name")
    val got = EditStore.screen(spark, corpus, "name", "sid", col("name"),
      batch, "sid", col("name"), k = 2)
    assertSameRows(got, brute(spark.read.parquet(corpus), batch, 2))
    got.select("new_id").distinct().as[Long].collect().toSet shouldBe
      Set(10L, 11L, 12L)

    // O(new): append a doc; base snapshots untouched, new partner found
    val root = java.nio.file.Paths.get(
      graft.sources.ArtifactStore.root,
      graft.sources.ArtifactStore.pathKey(corpus) + "_edit2c_name")
    def baseFiles = {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.contains("/base/") &&
          p.toString.endsWith(".parquet"))
        .toArray.toSeq.map(_.toString).sorted
      finally s.close()
    }
    val before = baseFiles
    Seq((5L, "nothing-close!")).toDF("sid", "name").coalesce(1)
      .write.mode("append").parquet(corpus)
    val got2 = EditStore.screen(spark, corpus, "name", "sid", col("name"),
      batch, "sid", col("name"), k = 2)
    assertSameRows(got2, brute(spark.read.parquet(corpus), batch, 2))
    got2.filter($"new_id" === 13L).select("dup_id").as[Long].collect() shouldBe
      Array(5L)
    baseFiles shouldBe before

    // corpusFilter scopes the stored side by sid
    EditStore.screen(spark, corpus, "name", "sid", col("name"),
      batch, "sid", col("name"), k = 2, corpusFilter = col("sid") <= 2)
      .select("dup_id").distinct().as[Long].collect().toSet shouldBe Set(1L, 2L)
  }

  test("stored pairs+labels advance: a new string MERGES two old clusters") {
    val base = Files.createTempDirectory("editstore-merge")
    val corpus = base.resolve("names.parquet").toString
    Seq((1L, "abcd"), (2L, "abce"), // dist 1
        (4L, "wxyz"), (5L, "wxyv"), // dist 1
        (6L, "mnop"))
      .toDF("sid", "name").coalesce(1).write.parquet(corpus)
    EditStore.clusters(spark, corpus, "name", "sid", col("name"), 2).count()

    // 7 bridges both clusters at dist 2; 8 is fresh; 9 duplicates 6
    Seq((7L, "abyz"), (8L, "qqqq"), (9L, "mnop"))
      .toDF("sid", "name").coalesce(1).write.mode("append").parquet(corpus)

    val all = spark.read.parquet(corpus)
      .select(col("sid"), col("name"))
    // pairs equal the inline exact join over the grown corpus
    assertSameRows(
      EditStore.similarPairs(spark, corpus, "name", "sid", col("name"), 2),
      EditJoin.similarPairs(all, "sid", col("name"), 2))
    // labels equal CC over that exact pair graph
    val expected = DupClusters.componentsAlternating(
      all.select(col("sid")), "sid",
      EditJoin.similarPairs(all, "sid", col("name"), 2)
        .select("id_a", "id_b"), "id_a", "id_b")
    assertSameRows(
      EditStore.clusters(spark, corpus, "name", "sid", col("name"), 2),
      expected)
    EditStore.clusters(spark, corpus, "name", "sid", col("name"), 2)
      .as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 1L, 7L -> 1L,
        6L -> 6L, 9L -> 6L, 8L -> 8L)

    // compaction folds; results unchanged
    EditStore.compact(spark, corpus, "name", "sid", col("name"), 2)
    assertSameRows(
      EditStore.clusters(spark, corpus, "name", "sid", col("name"), 2),
      expected)
  }
}
