// S9.20 probe: LAZY merge advances in the PrefixStore at 1M docs -
// the r9 verdict's item #2. A screen-only caller's 1% append must no
// longer pay for pairs/labels maintenance (r9 measured 47.0 s once
// the four-surface artifact landed, vs 7.5 s screen-only in r8); the
// deferred merge catch-up is paid exactly once, on the first
// pairs/clusters read after the append. ASCII only (spark-shell -i).
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_lazy_prefix.plog", true), true)
plog.println("=== lazy prefix probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
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

val sfRoot = "/root/repo/target/probe_lazyp"
val corpus = sfRoot + "/documents.parquet"
val artDir = "/root/repo/target/graft_index/" + graft.sources.ArtifactStore.pathKey(corpus) + "_prefix2_9_10"
rm(sfRoot); rm(artDir)

// 200k distinct base docs (40 Zipf-ish tokens from the doc id) + 4
// near-dup copies each = 1M docs in ~200k true J>=0.9 clusters of 5
val V = 50000.0; val L = 40
def tok(idCol: org.apache.spark.sql.Column, i: Int) =
  concat(lit("w"), (conv(substring(md5(concat(idCol.cast("string"), lit("_" + i))), 1, 6), 16, 10).cast("long") % V.toLong).cast("string"))
val baseText = concat_ws(" ", (0 until L).map(i => tok(col("base_id"), i)): _*)
val base = spark.range(200000L).select(col("id").as("base_id")).select(col("base_id").as("doc_id"), baseText.as("text"))
val dups = spark.range(200000L, 1000000L).select(col("id").as("doc_id"), (col("id") % 200000L).as("base_id"))
  .select(col("doc_id"), split(concat_ws(" ", (0 until L).map(i => tok(col("base_id"), i)): _*), " ").as("a"))
  .select(col("doc_id"), array_join(transform(col("a"), (x, i) => when(i === (col("doc_id") % L).cast("int"), concat(lit("pz"), (col("doc_id") % 7).cast("string"))).otherwise(x)), " ").as("text"))
base.unionByName(dups).repartition(64).write.parquet(corpus)

def screenBatch() = {
  // a tiny probe batch so screen cost is all reconcile, not screening
  val b = spark.range(2000000L, 2000100L).select(col("id").as("doc_id"), (col("id") % 200000L).as("base_id"))
    .select(col("doc_id"), baseText.as("text"))
  graft.dedup.PrefixStore.screen(spark, sfRoot, "documents", b, "doc_id", 9, 10)
}

timed("full build (screen serve, additive + lazy-skipped merges)") { screenBatch().count() }
timed("first pairs read (merge catch-up over the build... none pending)") {
  graft.dedup.PrefixStore.similarPairs(spark, sfRoot, "documents", 9, 10).count()
}

// 1% append: 10k docs, half fresh content, half near-dups of stored bases
val fresh = spark.range(3000000L, 3005000L).select(col("id").as("base_id"))
  .select(col("base_id").as("doc_id"), concat_ws(" ", (0 until L).map(i => tok(col("base_id") + 7777777L, i)): _*).as("text"))
val appDups = spark.range(3005000L, 3010000L).select(col("id").as("doc_id"), (col("id") % 200000L).as("base_id"))
  .select(col("doc_id"), split(concat_ws(" ", (0 until L).map(i => tok(col("base_id"), i)): _*), " ").as("a"))
  .select(col("doc_id"), array_join(transform(col("a"), (x, i) => when(i === (col("doc_id") % L).cast("int"), concat(lit("pq"), (col("doc_id") % 7).cast("string"))).otherwise(x)), " ").as("text"))
fresh.unionByName(appDups).coalesce(2).write.mode("append").parquet(corpus)

timed("SCREEN-ONLY 1% append advance (additive pieces only - the lazy win)") { screenBatch().count() }
timed("screen again (no pending work)") { screenBatch().count() }
val nPairs = timed("first pairs read AFTER append (deferred merge catch-up, paid once)") {
  graft.dedup.PrefixStore.similarPairs(spark, sfRoot, "documents", 9, 10).count()
}
timed("second pairs read (caught up - pure scan)") {
  graft.dedup.PrefixStore.similarPairs(spark, sfRoot, "documents", 9, 10).count()
}
val nLabels = timed("clusters read (same committed catch-up)") {
  graft.dedup.PrefixStore.clusters(spark, sfRoot, "documents", 9, 10).count()
}
plog.println(s"pairs=$nPairs labels=$nLabels (expect labels = 1010000)")
plog.println("parity: generation-chunking invariance + lazy catch-up correctness are spec-pinned (IncrementalChunkingParitySpec, PrefixStoreSpec)")
System.exit(0)
