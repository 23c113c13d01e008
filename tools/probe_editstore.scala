// S9.18 probe addendum: the STORED edit screen at 1M corpus strings -
// build cost, O(new) append, and per-batch screen wall. ASCII only.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_editstore.plog", true), true)
plog.println("=== editstore probe " + java.time.Instant.now)
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
val root = "/root/repo/target/probe_estore"
val corpus = root + "/names.parquet"
rm(root)
rm("/root/repo/target/graft_index/" + graft.sources.ArtifactStore.pathKey(corpus) + "_edit2_name")
spark.range(1000000L).select(col("id").as("sid"),
  substring(md5(col("id").cast("string")), 1, 12).as("name"))
  .repartition(32).write.parquet(corpus)
// batch: 5k typos of stored strings + 5k novel
val batch = spark.range(0L, 5000L).select((col("id") + 10000000L).as("sid"),
  concat(substring(md5(col("id").cast("string")), 1, 5), lit("z"),
    substring(md5(col("id").cast("string")), 7, 6)).as("name"))
  .unionByName(spark.range(0L, 5000L).select((col("id") + 20000000L).as("sid"),
    concat(lit("zz"), substring(md5((col("id") + 777L).cast("string")), 1, 10)).as("name")))
  .localCheckpoint()
import graft.dedup.EditStore
timed("store_build_1M") {
  EditStore.screen(spark, corpus, "name", "sid", col("name"),
    batch.limit(1), "sid", col("name"), k = 2).count()
}
val hits = timed("screen_10k_warm") {
  EditStore.screen(spark, corpus, "name", "sid", col("name"),
    batch, "sid", col("name"), k = 2).count()
}
plog.println(s"screen_hits=$hits (>=5000 planted expected)")
timed("append_write_10k") {
  spark.range(1000000L, 1010000L).select(col("id").as("sid"),
    substring(md5(col("id").cast("string")), 1, 12).as("name"))
    .repartition(2).write.mode("append").parquet(corpus)
}
timed("increment_advance_1pct") {
  EditStore.screen(spark, corpus, "name", "sid", col("name"),
    batch.limit(1), "sid", col("name"), k = 2).count()
}
val hits2 = timed("screen_10k_post_append") {
  EditStore.screen(spark, corpus, "name", "sid", col("name"),
    batch, "sid", col("name"), k = 2).count()
}
plog.println(s"screen_hits_post=$hits2")
plog.println("done")
