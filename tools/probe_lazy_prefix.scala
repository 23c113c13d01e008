// S9.20 probe: LAZY merge advances in the PrefixStore at 1M docs -
// the r9 verdict's item #2. A screen-only caller's 1% append must no
// longer pay for pairs/labels maintenance (r9 measured 47.0 s once
// the four-surface artifact landed, vs 7.5 s screen-only in r8); the
// deferred merge catch-up is paid exactly once, on the first
// pairs/clusters read after the append. Same Zipf corpus generator as
// the S9.16b probe (the r9 measurement being compared against).
// ASCII only (spark-shell -i).
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
rm(sfRoot)
rm("/root/repo/target/graft_index/" + graft.sources.ArtifactStore.pathKey(corpus) + "_prefix2_9_10")

// Zipf-ish 1M corpus (V^U(0,1) token draw - the S9.16b generator)
val V = 100000.0; val L = 40
val baseText = concat_ws(" ",
  (0 until L).map(i => concat(lit("w"),
    floor(pow(lit(V), rand(4200L + i))).cast("long"))): _*)
spark.range(1000000L).select(col("id").as("doc_id"), baseText.as("text"))
  .repartition(64).write.parquet(corpus)

def screenBatch() = {
  val b = spark.range(100L).select((col("id") + 20000000L).as("doc_id"),
    concat_ws(" ", (0 until L).map(i => concat(lit("w"),
      floor(pow(lit(V), rand(5500L + i))).cast("long"))): _*).as("text"))
  graft.dedup.PrefixStore.screen(spark, sfRoot, "documents", b, "doc_id", 9, 10)
}

timed("full build (screen serve; lazy merges pinned, not built... the screen path)") { screenBatch().count() }
timed("first pairs read (merge catch-up / full merge build)") {
  graft.dedup.PrefixStore.similarPairs(spark, sfRoot, "documents", 9, 10).count()
}

// 1% append: 10k docs - half true near-dups of stored docs (one token
// replaced; J = 39/41 > 0.9), half fresh Zipf draws
val nd = spark.read.parquet(corpus).where(col("doc_id") < 5000L)
  .select((col("doc_id") + 40000000L).as("doc_id"),
    split(col("text"), " ").as("a"))
  .select(col("doc_id"), array_join(transform(col("a"),
    (x, i) => when(i === (col("doc_id") % L).cast("int"),
      concat(lit("nd"), (col("doc_id") % 7).cast("string"))).otherwise(x)),
    " ").as("text"))
val fresh = spark.range(5000L).select((col("id") + 50000000L).as("doc_id"),
  concat_ws(" ", (0 until L).map(i => concat(lit("w"),
    floor(pow(lit(V), rand(7700L + i))).cast("long"))): _*).as("text"))
nd.unionByName(fresh).coalesce(4).write.mode("append").parquet(corpus)

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
plog.println(s"pairs=$nPairs (>= 5000 planted) labels=$nLabels (expect 1010000)")
plog.println("parity: generation-chunking invariance + lazy catch-up correctness are spec-pinned (IncrementalChunkingParitySpec, PrefixStoreSpec)")
System.exit(0)
