// S9.20 probe: stored hashed TF-IDF features at 1M docs - the r9
// verdict's item #1. A 100-query retrieval fleet served (a) inline
// (re-vectorize the corpus per fleet - the r9 shape) vs (b) from the
// TfIdfStore artifact (features/norms/ceilings/stats as stored scans,
// gate decisions off the stored stats row). ASCII only (spark-shell -i).
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_tfidf_store.plog", true), true)
plog.println("=== tfidf store probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
import graft.functions.{HashedTfIdf, TfIdfStore}
spark.conf.set("spark.sql.shuffle.partitions", 32)

def rm(p: String): Unit = {
  val d = java.nio.file.Paths.get(p)
  if (java.nio.file.Files.exists(d)) {
    val s = java.nio.file.Files.walk(d)
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]()).forEach(f => java.nio.file.Files.delete(f))
    finally s.close()
  }
}
def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

val sfRoot = "/root/repo/target/probe_tfidf"
val corpus = sfRoot + "/documents.parquet"
val artDir = "/root/repo/target/graft_index/" + graft.sources.ArtifactStore.pathKey(corpus) + "_tfidf1024"
rm(sfRoot); rm(artDir)

// 1M docs, 40 tokens each over a 50k vocab (realistic spread - the
// pruning regime, unlike the degenerate 31-token sf0.1 corpus)
val V = 50000.0; val L = 40
def tok(idCol: org.apache.spark.sql.Column, i: Int) =
  concat(lit("w"), (conv(substring(md5(concat(idCol.cast("string"), lit("_" + i))), 1, 6), 16, 10).cast("long") % V.toLong).cast("string"))
spark.range(1000000L).select(col("id").as("doc_id"),
    concat_ws(" ", (0 until L).map(i => tok(col("id"), i)): _*).as("text"))
  .repartition(64).write.parquet(corpus)

def fleetOf(f: org.apache.spark.sql.DataFrame) =
  f.where(col("doc_id") % 10000L === 0L).withColumnRenamed("doc_id", "query_id")

// (a) INLINE - the r9 serve shape: vectorize corpus + fleet per run
timed("inline fleet: sparseFeatures + topKCosinePruned (vectorize per run)") {
  val d = spark.read.parquet(corpus)
  val f = HashedTfIdf.sparseFeatures(d, "doc_id", col("text"), dim = 1024).localCheckpoint()
  HashedTfIdf.topKCosinePruned(f, fleetOf(f), k = 5).count()
}

// (b) STORED - build once, then fleets are stored scans + joins
timed("store build (one-off: features/norms/ceilings/stats artifact)") {
  TfIdfStore.features(spark, sfRoot).count()
}
def storedFleet() = {
  val f = TfIdfStore.features(spark, sfRoot)
  HashedTfIdf.topKCosinePrunedStored(f, fleetOf(f), k = 5,
    norms = TfIdfStore.norms(spark, sfRoot),
    ceilings = TfIdfStore.ceilings(spark, sfRoot),
    stats = TfIdfStore.stats(spark, sfRoot)).count()
}
timed("stored fleet 1 (serve from artifact)") { storedFleet() }
timed("stored fleet 2") { storedFleet() }
timed("stored fleet 3") { storedFleet() }

// append 1%: features advance O(new) under the pinned-idf contract
spark.range(2000000L, 2010000L).select(col("id").as("doc_id"),
    concat_ws(" ", (0 until L).map(i => tok(col("id"), i)): _*).as("text"))
  .coalesce(2).write.mode("append").parquet(corpus)
timed("1% append advance (O(new) vectorization)") {
  TfIdfStore.features(spark, sfRoot).count()
}
timed("stored fleet after append") { storedFleet() }
val drift = TfIdfStore.driftReport(spark, sfRoot).head
plog.println(s"pinned-idf drift after 1% same-distribution append: max_abs_dw=${drift.get(0)} mean_abs_dw=${drift.get(1)}")
System.exit(0)
