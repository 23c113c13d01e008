package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stored manifest equals the inline batch manifest; second call store-served") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val inline = ShardExport.manifest(docs, "doc_id", "text", 8, "42")
      .collect().map(_.toString).toSeq
    val stored = ShardStore.manifest(spark, dir, "documents", 8, "42")
      .collect().map(_.toString).toSeq
    stored shouldBe inline
    ShardStore.manifest(spark, dir, "documents", 8, "42")
      .collect().map(_.toString).toSeq shouldBe inline
  }

  test("corpus append assigns only the new docs; no existing doc moves shards") {
    val sf = java.nio.file.Files.createTempDirectory("shardstore-inc").toString
    val corpus = s"$sf/documents.parquet"
    (1L to 40L).map(i => (i, s"document number $i with some words"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    val before = ShardStore.assignments(spark, sf, "documents", 4, "42")
      .select("doc_id", "shard", "order_key").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    before.keySet shouldBe (1L to 40L).toSet

    (41L to 50L).map(i => (i, s"late arriving doc $i"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(corpus)
    val after = ShardStore.assignments(spark, sf, "documents", 4, "42")
      .select("doc_id", "shard", "order_key").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    after.keySet shouldBe (1L to 50L).toSet
    before.foreach { case (id, v) => after(id) shouldBe v }

    // manifest over the grown corpus still ties out against inline
    val inline = ShardExport.manifest(spark.read.parquet(corpus),
      "doc_id", "text", 4, "42").collect().map(_.toString).toSeq
    ShardStore.manifest(spark, sf, "documents", 4, "42")
      .collect().map(_.toString).toSeq shouldBe inline
  }
}
