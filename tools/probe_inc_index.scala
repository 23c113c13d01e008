// S9 probe: incremental text-index maintenance - increment cost O(new),
// not O(corpus). Replicates the sf0.1 documents table to ~1 M docs,
// times the full base build, then appends a 1% increment and times the
// reconcile. Run via spark-shell -i (see .claude/skills/verify).
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_inc_index.plog", true), true)
plog.println("=== incremental text index probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)

val corpusRoot = "/root/repo/target/probe_inc_corpus"
val sfDir = corpusRoot // TextIndexStore serves $sfDir/documents.parquet
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
rm("/root/repo/target/graft_index/" + graft.sources.ArtifactStore.pathKey(corpus) + "_inc2")

val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val n0 = base.count()
// 100 replicas with distinct ids and perturbed text (same discipline as S9.5)
val reps = 100
val big = base.crossJoin(spark.range(reps).toDF("r"))
  .select((col("doc_id") + col("r") * 10000000L).as("doc_id"),
    when(col("r") === 0, col("text")).otherwise(concat(col("text"), lit(" r"), col("r"))).as("text"))
big.repartition(32).write.mode("overwrite").parquet(corpus)
plog.println(s"corpus_docs=${n0 * reps}")

val t0 = System.nanoTime()
val nPost = graft.functions.TextIndexStore.postings(spark, sfDir).count()
plog.println(f"base_build_wall=${(System.nanoTime()-t0)/1e9}%.1f s postings_rows=$nPost")

// 1% increment: new parquet files appended next to the covered ones
val inc = base.limit(10000)
  .select((col("doc_id") + 999000000L).as("doc_id"),
    concat(col("text"), lit(" incr")).as("text"))
inc.coalesce(4).write.mode("append").parquet(corpus)
val t1 = System.nanoTime()
val nPost2 = graft.functions.TextIndexStore.postings(spark, sfDir).count()
plog.println(f"increment_wall=${(System.nanoTime()-t1)/1e9}%.1f s postings_rows=$nPost2 (10k new docs = 1%%)")

// steady-state read (ledger unchanged): reconcile is a listing diff only
val t2 = System.nanoTime()
graft.functions.TextIndexStore.postings(spark, sfDir).count()
plog.println(f"steady_read_wall=${(System.nanoTime()-t2)/1e9}%.1f s")

// compaction folds the delta into the base
val t3 = System.nanoTime()
graft.functions.TextIndexStore.compact(spark, corpus)
plog.println(f"compact_wall=${(System.nanoTime()-t3)/1e9}%.1f s")

val t4 = System.nanoTime()
val q = graft.functions.TextSearch.bm25OverPostings(
  graft.functions.TextIndexStore.postings(spark, sfDir), "doc_id",
  Seq("data", "pipeline"), stats = Some(graft.functions.TextIndexStore.stats(spark, sfDir)))
plog.println(f"bm25_over_compacted matched=${q.count()} wall=${(System.nanoTime()-t4)/1e9}%.1f s")
rm(corpusRoot)
plog.println("=== done")
plog.close()
System.exit(0)
