// S9.18 probe addendum 2: STORED edit-distance clusters at 1M
// strings - full build vs O(affected) increment vs cold rebuild,
// plus label parity. 100k distinct base strings x (4 exact copies +
// 5 distance-1 typos + the base) = 1M strings in 100k true clusters.
// ASCII only.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_editclusters.plog", true), true)
plog.println("=== edit clusters probe " + java.time.Instant.now)
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
val root = "/root/repo/target/probe_eclusters"
val corpus = root + "/names.parquet"
val artDir = "/root/repo/target/graft_index/" + graft.sources.ArtifactStore.pathKey(corpus) + "_edit1b_name"
rm(root); rm(artDir)

// base string of cluster c = md5(c) 12 chars; member m of cluster c:
// m%10 in 0..4 -> exact copy; 5..9 -> substitute char (m%12) with 'z'
def baseOf(c: org.apache.spark.sql.Column) = substring(md5(c.cast("string")), 1, 12)
val c = col("id") % 100000L
val m = col("id")
val b = baseOf(c)
val name = when(m % 10 < 5, b).otherwise(
  concat(expr("substring(substring(md5(cast(id % 100000 as string)), 1, 12), 1, cast(id % 12 as int))"),
    lit("z"),
    expr("substring(substring(md5(cast(id % 100000 as string)), 1, 12), cast(id % 12 as int) + 2, 12)")))
spark.range(1000000L).select(col("id").as("sid"), name.as("name"))
  .repartition(32).write.parquet(corpus)

import graft.dedup.{EditStore, EditJoin, DupClusters}
timed("full_build_1M_k1") {
  EditStore.clusters(spark, corpus, "name", "sid", col("name"), 1).count()
}
timed("serve_labels_warm") {
  EditStore.clusters(spark, corpus, "name", "sid", col("name"), 1).count()
}
// 1% append: 5k novel + 5k joining (typos of clusters 0..4999)
val cj = col("id") % 5000L
val joinName = concat(substring(md5(cj.cast("string")), 1, 11), lit("q"))
spark.range(2000000L, 2005000L).select(col("id").as("sid"),
    concat(lit("nv"), substring(md5(col("id").cast("string")), 1, 10)).as("name"))
  .unionByName(spark.range(3000000L, 3005000L).select(col("id").as("sid"),
    joinName.as("name")))
  .repartition(2).write.mode("append").parquet(corpus)
val inc = timed("increment_advance_1pct") {
  val df = EditStore.clusters(spark, corpus, "name", "sid", col("name"), 1)
  df.count(); df.localCheckpoint()
}
rm(artDir)
val cold = timed("cold_rebuild_1p01M") {
  val df = EditStore.clusters(spark, corpus, "name", "sid", col("name"), 1)
  df.count(); df.localCheckpoint()
}
val diffs = inc.withColumnRenamed("cluster_id", "a")
  .join(cold.withColumnRenamed("cluster_id", "b"), "sid")
  .where(col("a") =!= col("b")).count()
plog.println(s"label_diffs_incremental_vs_rebuild=$diffs (0 expected)")
plog.println("done")
