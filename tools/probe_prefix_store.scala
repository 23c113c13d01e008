// S9.16b probe: PrefixStore increment cost at 1 M docs - the O(new)
// contract measured, not just spec-pinned. Build the store over the
// Zipf 1M corpus, time a 1% file append's reconcile, and screen a
// 10k batch before and after. ASCII only (spark-shell -i).
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_prefix_store.plog", true), true)
plog.println("=== prefix store increment probe " + java.time.Instant.now)
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
val sfRoot = "/root/repo/target/probe_pstore"
rm(sfRoot)
rm("/root/repo/target/graft_index/" + graft.sources.ArtifactStore.pathKey(sfRoot + "/documents.parquet") + "_prefix2_9_10")

val V = 100000.0; val L = 40; val n = 1000000L
val baseText = concat_ws(" ",
  (0 until L).map(i => concat(lit("w"),
    floor(pow(lit(V), rand(4200L + i))).cast("long"))): _*)
val corpus = sfRoot + "/documents.parquet"
spark.range(n).select(col("id").as("doc_id"), baseText.as("text"))
  .repartition(64).write.parquet(corpus)

def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

// batch: 10k docs, half near-dups of corpus docs, half novel
val probeBatch = spark.range(5000L)
  .select((col("id") + 20000000L).as("doc_id"),
    concat_ws(" ", (0 until L - 1).map(i => concat(lit("w"),
      floor(pow(lit(V), rand(4200L + i))).cast("long"))) :+
      concat(lit("zz"), col("id")): _*).as("text"))
  .unionByName(spark.range(5000L)
    .select((col("id") + 30000000L).as("doc_id"),
      concat_ws(" ", (0 until L).map(i => concat(lit("nv"),
        floor(pow(lit(V), rand(9900L + i))).cast("long"))): _*).as("text")))
  .localCheckpoint()

timed("full_build_1M") {
  graft.dedup.PrefixStore.screen(spark, sfRoot, "documents",
    probeBatch, "doc_id", 9, 10).count()
}
val hits1 = timed("screen_10k_warm_store") {
  graft.dedup.PrefixStore.screen(spark, sfRoot, "documents",
    probeBatch, "doc_id", 9, 10).count()
}
plog.println(s"screen_hits_pre_append=$hits1")

// 1% append: 10k new docs as new parquet files
timed("append_write") {
  spark.range(10000L)
    .select((col("id") + 40000000L).as("doc_id"),
      concat_ws(" ", (0 until L).map(i => concat(lit("w"),
        floor(pow(lit(V), rand(7700L + i))).cast("long"))): _*).as("text"))
    .coalesce(4).write.mode("append").parquet(corpus)
}
val hits2 = timed("reconcile_plus_screen_after_1pct_append") {
  graft.dedup.PrefixStore.screen(spark, sfRoot, "documents",
    probeBatch, "doc_id", 9, 10).count()
}
plog.println(s"screen_hits_post_append=$hits2")
plog.println("probe done")
System.exit(0)
