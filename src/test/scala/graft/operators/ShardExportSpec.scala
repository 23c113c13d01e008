package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  test("assignment is stable: a doc's shard ignores the rest of the corpus") {
    val full = ShardExport.assign(docs, "doc_id", 8, "42")
      .select("doc_id", "shard", "order_key").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    val half = ShardExport.assign(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", 8, "42")
      .select("doc_id", "shard", "order_key").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    half.foreach { case (id, v) => full(id) shouldBe v }
    all(full.values.map(_._1)) should (be >= 0 and be < 8)
  }

  test("different seeds give a different permutation (not a relabeling)") {
    val a = ShardExport.assign(docs, "doc_id", 8, "42")
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = ShardExport.assign(docs, "doc_id", 8, "7")
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val moved = a.count { case (id, s) => b(id) != s }
    assert(moved > 0, "seed change did not move any document")
  }

  test("manifest totals tie out against direct corpus aggregates") {
    val m = ShardExport.manifest(docs, "doc_id", "text", 8, "42").collect()
    m.map(_.getInt(0)).toSeq shouldBe m.map(_.getInt(0)).toSeq.sorted
    val totalDocs = m.map(_.getLong(1)).sum
    val totalBytes = m.map(_.getLong(3)).sum
    totalDocs shouldBe docs.count()
    val wantBytes = docs.select(sum(octet_length(col("text")).cast("long")))
      .collect().head.getLong(0)
    totalBytes shouldBe wantBytes
    // order-key ranges are consistent
    m.foreach(r => assert(r.getString(4) <= r.getString(5)))
  }

  test("export writes shard= partition dirs, each file sorted by order_key") {
    val out = Files.createTempDirectory("shard_export").toString
    try {
      val manifest = ShardExport.export(docs, "doc_id", "text", 4, "42", out)
      manifest.count() shouldBe 4
      val dirs = Files.list(Paths.get(out))
      val shardDirs =
        try dirs.filter(p => p.getFileName.toString.startsWith("shard="))
          .toArray.map(_.toString).sorted
        finally dirs.close()
      shardDirs.length shouldBe 4
      // each shard's parquet files are internally ordered by order_key
      shardDirs.foreach { sd =>
        val keys = spark.read.parquet(sd).select("order_key")
          .collect().map(_.getString(0))
        keys.toSeq shouldBe keys.toSeq.sorted
      }
      // round trip: every doc lands in exactly its assigned shard
      val back = spark.read.parquet(out).groupBy("shard").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val want = manifest.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      back shouldBe want
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
