// S9.13 probe: shard export at 1M docs - hash-shard balance (the law of
// large numbers claim, measured) and manifest/export wall.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_shard.plog", true), true)
plog.println("=== shard export probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
import graft.operators.ShardExport
spark.conf.set("spark.sql.shuffle.partitions", 32)

// 200x replication of sf0.1 documents (5k) = 1M docs, distinct ids
val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val corpus = "/root/repo/target/probe_shard_docs.parquet"
base.crossJoin(spark.range(200).toDF("r"))
  .select((col("doc_id") + col("r") * 10000000L).as("doc_id"),
    col("text"), col("lang"), col("source"), col("n_chars"))
  .repartition(32).write.mode("overwrite").parquet(corpus)
val docs = spark.read.parquet(corpus)
plog.println(s"corpus_docs=${docs.count()}")

def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

// balance at 1024 shards (manifest only - one aggregate)
val m1024 = timed("manifest_1024") {
  ShardExport.manifest(docs, "doc_id", "text", 1024, "42").collect()
}
val nd = m1024.map(_.getLong(1)); val nt = m1024.map(_.getLong(2))
plog.println(s"shards=${m1024.length}")
plog.println(f"docs/shard mean=${nd.sum / nd.length}%d min=${nd.min}%d max=${nd.max}%d " +
  f"max/mean=${nd.max.toDouble * nd.length / nd.sum}%.3f")
plog.println(f"tokens/shard mean=${nt.sum / nt.length}%d min=${nt.min}%d max=${nt.max}%d " +
  f"max/mean=${nt.max.toDouble * nt.length / nt.sum}%.3f")

// full export at 64 shards (writes ~1M rows partitioned)
val outDir = "/root/repo/target/probe_shard_out"
val m64 = timed("export_64") {
  ShardExport.export(docs, "doc_id", "text", 64, "42", outDir)
}
val c = spark.read.parquet(outDir).count()
plog.println(s"exported_rows=$c")

// deterministic: manifest twice, byte-identical
val again = ShardExport.manifest(docs, "doc_id", "text", 1024, "42").collect()
plog.println(s"deterministic=${m1024.map(_.toString).sameElements(again.map(_.toString))}")

plog.println("done")
plog.close()
System.exit(0)
