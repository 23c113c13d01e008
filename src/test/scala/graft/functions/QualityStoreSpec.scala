package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Persisted quality scores are bit-identical to an inline t2 scan
  * (qualityScore is round()ed fixed-point over exact counts), so
  * consumers reading the store keep hash-matching oracles that
  * recompute quality inline.
  */
class QualityStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("stored scores equal the inline scan; second call serves the store") {
    val inline = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.qualityScore(col("text"),
        TextFunctions.normalize(col("text"))).as("quality"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val stored = QualityStore.scores(spark, dir, "documents")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    stored shouldBe inline
    QualityStore.scores(spark, dir, "documents")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap shouldBe inline
  }

  test("corpus append scores only the new files; totals stay inline-exact") {
    import spark.implicits._
    val sf = java.nio.file.Files.createTempDirectory("qstore-inc").toString
    val corpus = s"$sf/documents.parquet"
    Seq((1L, "clean readable text here with words"), (2L, "x!!!"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    QualityStore.scores(spark, sf, "documents").count() shouldBe 2

    Seq((3L, "another perfectly normal document of words and more words"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(corpus)
    val got = QualityStore.scores(spark, sf, "documents")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val inline = spark.read.parquet(corpus)
      .select(col("doc_id"), TextFunctions.qualityScore(col("text"),
        TextFunctions.normalize(col("text"))).as("quality"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got shouldBe inline
    got.keySet shouldBe Set(1L, 2L, 3L)
  }
}
