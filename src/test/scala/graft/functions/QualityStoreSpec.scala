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
}
