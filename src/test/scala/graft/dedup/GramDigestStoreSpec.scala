package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.TextFunctions

/** The stored gram / fingerprint tables are bit-identical to inline
  * derivation (both are pure per-doc functions), advance O(new) on a
  * corpus append, and their consumers (d12 decontam, d11 bloom dedup)
  * keep matching the inline-path results row for row.
  */
class GramStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def inlineGrams(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select(col("doc_id"), explode(array_distinct(
        Decontam.wordGrams(TextFunctions.normalize(col("text")), 5))).as("gram"))
      .as[(Long, String)].collect().toSet

  test("stored grams equal the inline per-doc derivation") {
    val stored = GramStore.grams(spark, dir, "documents", n = 5)
      .as[(Long, String)].collect().toSet
    stored shouldBe inlineGrams(Tables.load(spark, dir, "documents"))
  }

  test("append extracts grams for new files only; decontam equal through the store") {
    val sf = java.nio.file.Files.createTempDirectory("gstore-inc").toString
    val corpus = s"$sf/documents.parquet"
    Seq((1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "short"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    GramStore.grams(spark, sf, "documents", n = 5).count() should be > 0L

    Seq((3L, "an appended document with the quick brown fox jumps over it"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(corpus)
    val stored = GramStore.grams(spark, sf, "documents", n = 5)
      .as[(Long, String)].collect().toSet
    stored shouldBe inlineGrams(spark.read.parquet(corpus))
    stored.map(_._1) should contain(3L)

    // d12-shape equality: report over stored grams == inline report
    val d = spark.read.parquet(corpus)
    val viaStore = Decontam.reportAgainstGrams(
        d.filter(col("doc_id") === 1L),
        GramStore.grams(spark, sf, "documents", n = 5)
          .filter(col("doc_id") =!= 1L),
        "doc_id", TextFunctions.normalize(col("text")), n = 5)
      .collect().map(_.toSeq).toSet
    val inline = Decontam.report(
        d.filter(col("doc_id") === 1L), d.filter(col("doc_id") =!= 1L),
        "doc_id", TextFunctions.normalize(col("text")), n = 5)
      .collect().map(_.toSeq).toSet
    viaStore shouldBe inline
  }
}

class DigestStoreSpec extends SparkSpec {
  import spark.implicits._

  test("stored digests equal inline fingerprints; bloom dedup equal through the store") {
    val sf = java.nio.file.Files.createTempDirectory("dstore-inc").toString
    val corpus = s"$sf/documents.parquet"
    Seq((1L, "seen document one"), (2L, "seen document two"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    DigestStore.digests(spark, sf, "documents").count() shouldBe 2

    Seq((3L, "a later ingest accepted into the corpus"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(corpus)
    val stored = DigestStore.digests(spark, sf, "documents")
      .as[(Long, String)].collect().toMap
    val inline = spark.read.parquet(corpus)
      .select(col("doc_id"), TextFunctions.fingerprint(
        TextFunctions.normalize(col("text"))).as("fp"))
      .as[(Long, String)].collect().toMap
    stored shouldBe inline

    // an incoming batch with one dup of doc 2 and one new doc screens
    // against the STORED seen set
    val batch = Seq((10L, "seen document two"), (11L, "never seen before"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.fingerprint(
        TextFunctions.normalize(col("text"))).as("fp"))
    val kept = BloomDedup.newRows(batch,
        DigestStore.digests(spark, sf, "documents"),
        fpCol = "fp", expectedItems = 1000)
      .select("doc_id").as[Long].collect().toSet
    kept shouldBe Set(11L)
  }
}

class BandStoreSpec extends SparkSpec {
  import spark.implicits._

  test("stored bands equal inline banding; probe through the store finds near-dups O(new)") {
    val sf = java.nio.file.Files.createTempDirectory("bstore-inc").toString
    val corpus = s"$sf/documents.parquet"
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "entirely different content about compilers and type systems"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    val norm = graft.functions.TextFunctions.normalize(col("text"))
    def inlineBands(df: org.apache.spark.sql.DataFrame) =
      MinHashLSH.bandedIndex(df, "doc_id", norm)
        .as[(Long, Int, String)].collect().toSet
    BandStore.bands(spark, sf, "documents")
      .as[(Long, Int, String)].collect().toSet shouldBe
      inlineBands(spark.read.parquet(corpus))

    // append: only new files banded; probe an incoming batch with one
    // near-dup of doc 1 and one fresh doc against the stored index
    Seq((3L, "more corpus growth with novel words and phrases"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(corpus)
    BandStore.bands(spark, sf, "documents")
      .as[(Long, Int, String)].collect().toSet shouldBe
      inlineBands(spark.read.parquet(corpus))

    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "completely unrelated incoming text"))
      .toDF("doc_id", "text")
    val hits = MinHashLSH.probeCandidates(
        BandStore.bands(spark, sf, "documents"), batch, "doc_id", norm)
      .select("id_index", "id_probe").as[(Long, Long)].collect().toSet
    hits should contain((1L, 10L)) // exact dup collides in every band
    hits.map(_._2) should not contain 11L
  }
}

class IngestScreenSpec extends SparkSpec {
  import spark.implicits._

  test("one call splits a batch into exact_dup / near_dup / fresh against stored artifacts") {
    val sf = java.nio.file.Files.createTempDirectory("iscreen").toString
    val corpus = s"$sf/documents.parquet"
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog every single day"),
      (2L, "a corpus document about scala spark engines and their optimizers"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)

    val batch = Seq(
      (10L, "The Quick  Brown fox jumps over the lazy dog every single day"), // exact after normalization
      (11L, "the quick brown fox jumps over the lazy cat every single day"),  // near-dup of 1
      (12L, "entirely novel content that matches nothing stored"))            // fresh
      .toDF("doc_id", "text")
    val got = IngestScreen.screen(spark, sf, "documents", batch, "doc_id")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    got(10L) shouldBe "exact_dup"
    got(11L) shouldBe "near_dup"
    got(12L) shouldBe "fresh"

    // the stored sides advance O(new): after committing the fresh doc,
    // re-screening it reports exact_dup
    Seq((12L, "entirely novel content that matches nothing stored"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(corpus)
    IngestScreen.screen(spark, sf, "documents",
        batch.filter(col("doc_id") === 12L), "doc_id")
      .select("status").as[String].collect() shouldBe Array("exact_dup")
  }
}
