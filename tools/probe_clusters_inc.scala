// S9.12 probe: ClusterStore at 100-wide duplication (the shape whose
// uncontracted build exceeded the S9.11 probe window) + the
// incremental advance cost vs a full rebuild.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_clusters_inc.plog", true), true)
plog.println("=== clusters contracted+incremental probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)

val corpusRoot = "/root/repo/target/probe_clinc"
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
// clear any stale artifacts for this corpus path
val idxRoot = java.nio.file.Paths.get(graft.sources.ArtifactStore.root)
if (java.nio.file.Files.exists(idxRoot)) {
  val s = java.nio.file.Files.list(idxRoot)
  try s.filter(_.getFileName.toString.contains("probe_clinc"))
    .forEach(p => rm(p.toString))
  finally s.close()
}

// 100-wide duplication: every sf0.1 text appears 100x under distinct ids
val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val reps = 100
val big = base.crossJoin(spark.range(reps).toDF("r"))
  .select((col("doc_id") + col("r") * 10000000L).as("doc_id"), col("text"))
big.repartition(32).write.mode("overwrite").parquet(corpus)
val nDocs = spark.read.parquet(corpus).count()
plog.println(s"corpus_docs=$nDocs duplication_width=$reps")

// contracted full build - previously pathological at this shape
val t0 = System.nanoTime()
val labels0 = graft.dedup.ClusterStore.clusters(spark, corpusRoot, "documents", maxDist = 6)
plog.println(f"full_build_contracted=${(System.nanoTime()-t0)/1e9}%.1f s labels=${labels0.count()}")

// steady-state read
val t1 = System.nanoTime()
graft.dedup.ClusterStore.clusters(spark, corpusRoot, "documents", maxDist = 6).count()
plog.println(f"steady_read=${(System.nanoTime()-t1)/1e9}%.1f s")

// 2% increment: half duplicates of existing texts (each touches a
// 100-wide cluster - the expensive path), half brand-new texts
val newDup = base.limit(250).select((col("doc_id") + 990000000L).as("doc_id"), col("text"))
val newFresh = base.limit(250).select((col("doc_id") + 995000000L).as("doc_id"),
  concat(lit("entirely novel increment document "), col("doc_id"), lit(" "), col("text")).as("text"))
newDup.union(newFresh).coalesce(2).write.mode("append").parquet(corpus)
val t2 = System.nanoTime()
val labels1 = graft.dedup.ClusterStore.clusters(spark, corpusRoot, "documents", maxDist = 6)
val n1 = labels1.count()
plog.println(f"increment_500new=${(System.nanoTime()-t2)/1e9}%.1f s labels=$n1")

// equality vs a from-scratch contracted rebuild over the grown corpus
val d = spark.read.parquet(corpus)
val sims = graft.dedup.SimHash.compute(d, "doc_id",
  graft.functions.TextFunctions.normalize(col("text")))
val t3 = System.nanoTime()
val full = graft.dedup.DupClusters.componentsContracted(d, "doc_id", sims, "simhash",
  reps => graft.dedup.SimHash.nearPairs(reps, "doc_id", maxDist = 6))
val nFull = full.count()
plog.println(f"full_rebuild_equiv=${(System.nanoTime()-t3)/1e9}%.1f s labels=$nFull")
val diffs = labels1.except(full).count() + full.except(labels1).count()
plog.println(s"label_diffs_vs_full=$diffs")
rm(corpusRoot)
plog.println("=== done")
plog.close()
System.exit(0)
