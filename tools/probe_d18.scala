// S9 probe: d18 keepBest at 100x with BOTH inputs store-served -
// S9.9 measured 34 s dominated by re-running t2 scoring per query;
// QualityStore + ClusterStore amortize both (build once, query many).
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_d18.plog", true), true)
plog.println("=== d18 store-served probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)

val corpusRoot = "/root/repo/target/probe_d18_corpus"
val corpus = corpusRoot + "/documents.parquet"
def rm(p: String): Unit = {
  val d = java.nio.file.Paths.get(p)
  if (java.nio.file.Files.exists(d)) {
    val s = java.nio.file.Files.walk(d)
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]()).forEach(f => java.nio.file.Files.delete(f))
    finally s.close()
  }
}
rm(corpusRoot)
val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val reps = 20
// replicated ids (doc_id % 250000 style duplication from S9.9): text
// EXACT copies so SimHash clusters form, distinct doc_ids
val big = base.crossJoin(spark.range(reps).toDF("r"))
  .select((col("doc_id") + col("r") * 10000000L).as("doc_id"), col("text"))
big.repartition(32).write.mode("overwrite").parquet(corpus)
plog.println(s"corpus_docs=${spark.read.parquet(corpus).count()}")

// one-off artifact builds (the once-per-ingest jobs)
val t0 = System.nanoTime()
val clusters = graft.dedup.ClusterStore.clusters(spark, corpusRoot, "documents", maxDist = 6)
plog.println(f"cluster_store_build=${(System.nanoTime()-t0)/1e9}%.1f s clusters_rows=${clusters.count()}")
val t1 = System.nanoTime()
val quality = graft.functions.QualityStore.scores(spark, corpusRoot, "documents")
plog.println(f"quality_store_build=${(System.nanoTime()-t1)/1e9}%.1f s rows=${quality.count()}")

// the d18 query itself, everything store-served (second-call shape)
val t2 = System.nanoTime()
val out = graft.dedup.DupClusters.keepBest(
  graft.dedup.ClusterStore.clusters(spark, corpusRoot, "documents", maxDist = 6),
  graft.functions.QualityStore.scores(spark, corpusRoot, "documents"),
  "doc_id", "quality")
plog.println(f"d18_store_served=${(System.nanoTime()-t2)/1e9}%.1f s keep_rows=${out.count()} (was 34.0 s with inline scoring, S9.9)")
rm(corpusRoot)
plog.println("=== done")
plog.close()
System.exit(0)
