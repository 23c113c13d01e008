// S9.18 probe: stored EXACT cluster labels (d25 machinery) at 500k
// docs - the r8 verdict's top item measured. Full build vs O(affected)
// increment vs rebuild-from-scratch, plus label parity between the
// incremental result and a fresh rebuild. ASCII only (spark-shell -i).
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_labels_inc.plog", true), true)
plog.println("=== labels inc probe " + java.time.Instant.now)
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

val sfRoot = "/root/repo/target/probe_labels"
val corpus = sfRoot + "/documents.parquet"
val artDir = "/root/repo/target/graft_index/" + graft.sources.ArtifactStore.pathKey(corpus) + "_prefix2_9_10"
rm(sfRoot); rm(artDir)

// 100k distinct base docs (40 Zipf tokens, derived deterministically
// from the doc id) + 4 near-dup copies each (one token replaced) =
// 500k docs in ~100k true J>=0.9 clusters of 5
val V = 50000.0; val L = 40
def tok(idCol: org.apache.spark.sql.Column, i: Int) =
  concat(lit("w"), (conv(substring(md5(concat(idCol.cast("string"), lit("_" + i))), 1, 6), 16, 10).cast("long") % V.toLong).cast("string"))
val baseText = concat_ws(" ", (0 until L).map(i => tok(col("base_id"), i)): _*)
val base = spark.range(100000L).select(col("id").as("base_id")).select(col("base_id").as("doc_id"), baseText.as("text"))
val dups = spark.range(100000L, 500000L).select(col("id").as("doc_id"), (col("id") % 100000L).as("base_id"))
  .select(col("doc_id"), split(concat_ws(" ", (0 until L).map(i => tok(col("base_id"), i)): _*), " ").as("a"))
  .select(col("doc_id"), array_join(transform(col("a"), (x, i) => when(i === (col("doc_id") % L).cast("int"), concat(lit("pz"), (col("doc_id") % 7).cast("string"))).otherwise(x)), " ").as("text"))
base.unionByName(dups).repartition(64).write.parquet(corpus)

timed("full_build_500k") {
  graft.dedup.PrefixStore.clusters(spark, sfRoot, "documents", 9, 10).count()
}
timed("serve_labels_warm") {
  graft.dedup.PrefixStore.clusters(spark, sfRoot, "documents", 9, 10).count()
}
timed("serve_pairs_warm") {
  graft.dedup.PrefixStore.similarPairs(spark, sfRoot, "documents", 9, 10).count()
}

// 2% append: 5k novel docs + 5k near-dups of bases 0..4999 (these
// join/relabel existing clusters - the affected subgraph)
val novel = spark.range(600000L, 605000L).select(col("id").as("doc_id"),
  concat_ws(" ", (0 until L).map(i => concat(lit("nv"), (conv(substring(md5(concat(col("id").cast("string"), lit("_x" + i))), 1, 6), 16, 10).cast("long") % 20000L).cast("string"))): _*).as("text"))
val joining = spark.range(700000L, 705000L).select(col("id").as("doc_id"), (col("id") % 5000L).as("base_id"))
  .select(col("doc_id"), split(concat_ws(" ", (0 until L).map(i => tok(col("base_id"), i)): _*), " ").as("a"))
  .select(col("doc_id"), array_join(transform(col("a"), (x, i) => when(i === (col("doc_id") % L).cast("int"), concat(lit("qz"), (col("doc_id") % 5).cast("string"))).otherwise(x)), " ").as("text"))
timed("append_write_10k") {
  novel.unionByName(joining).repartition(2).write.mode("append").parquet(corpus)
}
val incLabels = timed("increment_advance_10k") {
  val df = graft.dedup.PrefixStore.clusters(spark, sfRoot, "documents", 9, 10)
  df.count(); df.localCheckpoint()
}
// parity: wipe the artifact, rebuild cold on the grown corpus, diff
rm(artDir)
val coldLabels = timed("cold_rebuild_510k") {
  val df = graft.dedup.PrefixStore.clusters(spark, sfRoot, "documents", 9, 10)
  df.count(); df.localCheckpoint()
}
val diffs = incLabels.withColumnRenamed("cluster_id", "a")
  .join(coldLabels.withColumnRenamed("cluster_id", "b"), "doc_id")
  .where(col("a") =!= col("b")).count()
plog.println(s"label_diffs_incremental_vs_rebuild=$diffs (0 expected)")
plog.println("done")
