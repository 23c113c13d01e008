package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.TextFunctions

class ClusterStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("stored clusters are identical to an inline contraction run") {
    val stored = ClusterStore.clusters(spark, dir, "documents", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d = Tables.load(spark, dir, "documents")
    val sims = SimHash.compute(d, "doc_id", TextFunctions.normalize(col("text")))
    val pairs = SimHash.nearPairs(sims, "doc_id", maxDist = 6)
    val inline = DupClusters.componentsAlternating(d, "doc_id", pairs,
        "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    stored shouldBe inline
    // second read serves the committed artifact
    ClusterStore.clusters(spark, dir, "documents", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe inline
  }
}
