// S9.12 probe: decontamination against the STORED gram index at 500k
// docs - store build once, O(new) increment, per-check cost after.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_gramstore.plog", true), true)
plog.println("=== gram store probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)

val corpusRoot = "/root/repo/target/probe_gram"
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
val idxRoot = java.nio.file.Paths.get(graft.sources.ArtifactStore.root)
if (java.nio.file.Files.exists(idxRoot)) {
  val s = java.nio.file.Files.list(idxRoot)
  try s.filter(_.getFileName.toString.contains("probe_gram"))
    .forEach(p => rm(p.toString))
  finally s.close()
}

// 100x sf0.1 documents with per-replica text variation (so grams are
// not fully duplicated: realistic distinct-heavy corpus)
val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val reps = 100
val big = base.crossJoin(spark.range(reps).toDF("r"))
  .select((col("doc_id") + col("r") * 10000000L).as("doc_id"),
    concat(col("text"), lit(" replica marker "), col("r")).as("text"))
big.repartition(32).write.mode("overwrite").parquet(corpus)
plog.println(s"corpus_docs=${spark.read.parquet(corpus).count()}")

// benchmark slice: 500 fresh docs, half leaked verbatim from corpus
val bench = base.limit(250)
  .select((col("doc_id") + 990000000L).as("doc_id"),
    concat(col("text"), lit(" replica marker 7")).as("text"))
  .union(base.limit(250).select((col("doc_id") + 995000000L).as("doc_id"),
    concat(lit("held out eval question about "), col("text")).as("text")))

// inline decontam (the per-check cost WITHOUT the store)
val t0 = System.nanoTime()
val inline = graft.dedup.Decontam.report(bench, spark.read.parquet(corpus),
  "doc_id", graft.functions.TextFunctions.normalize(col("text")), n = 5)
val nInline = inline.filter(col("is_contaminated")).count()
plog.println(f"inline_check=${(System.nanoTime()-t0)/1e9}%.1f s contaminated=$nInline")

// store build (once per corpus version)
val t1 = System.nanoTime()
graft.dedup.GramStore.grams(spark, corpusRoot, "documents", 5).count()
plog.println(f"gram_store_build=${(System.nanoTime()-t1)/1e9}%.1f s")

// per-check cost THROUGH the store (the repeated-release path)
val t2 = System.nanoTime()
val viaStore = graft.dedup.Decontam.reportAgainstGrams(bench,
  graft.dedup.GramStore.grams(spark, corpusRoot, "documents", 5),
  "doc_id", graft.functions.TextFunctions.normalize(col("text")), n = 5)
val nStore = viaStore.filter(col("is_contaminated")).count()
plog.println(f"store_check=${(System.nanoTime()-t2)/1e9}%.1f s contaminated=$nStore (must equal inline)")

// 2% corpus append: increment cost
val inc = base.limit(500)
  .select((col("doc_id") + 980000000L).as("doc_id"),
    concat(col("text"), lit(" appended generation")).as("text"))
inc.coalesce(2).write.mode("append").parquet(corpus)
val t3 = System.nanoTime()
graft.dedup.GramStore.grams(spark, corpusRoot, "documents", 5).count()
plog.println(f"increment_500docs=${(System.nanoTime()-t3)/1e9}%.1f s")
rm(corpusRoot)
plog.println("=== done")
plog.close()
System.exit(0)
