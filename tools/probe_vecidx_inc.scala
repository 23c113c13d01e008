// S9.12 probe: incremental IVFPQ index for batch appends at 400k
// vectors - increment cost O(new) with pinned books vs full re-encode.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_vecidx_inc.plog", true), true)
plog.println("=== vector index incremental probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)

val corpusRoot = "/root/repo/target/probe_vidx"
val corpus = corpusRoot + "/embeddings.parquet"
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
  try s.filter(_.getFileName.toString.contains("probe_vidx"))
    .forEach(p => rm(p.toString))
  finally s.close()
}

// 200x replication of sf0.1 embeddings (2k vecs) = 400k, distinct ids,
// deterministic per-replica perturbation so vectors are distinct
val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
val reps = 200
val big = base.crossJoin(spark.range(reps).toDF("r"))
  .select((col("vec_id") + col("r") * 10000000L).as("vec_id"),
    transform(col("embedding"),
      (x, i) => x + (pmod(col("vec_id") * 31 + col("r") * 7 + i, lit(11)).cast("float") - 5.0f) / 1000.0f)
      .as("embedding"))
big.repartition(32).write.mode("overwrite").parquet(corpus)
plog.println(s"corpus_vecs=${spark.read.parquet(corpus).count()}")

val recipe = graft.similarity.VectorIndexStore.Recipe(
  coarseK = 64, coarseIters = 2, m = 4, subDim = 16, k = 16, iters = 1)

val t0 = System.nanoTime()
val idx0 = graft.similarity.VectorIndexStore.index(spark, corpusRoot, "embeddings",
  "vec_id", "embedding", recipe)
plog.println(f"full_build=${(System.nanoTime()-t0)/1e9}%.1f s codes=${idx0.count()}")

val t1 = System.nanoTime()
graft.similarity.VectorIndexStore.index(spark, corpusRoot, "embeddings",
  "vec_id", "embedding", recipe).count()
plog.println(f"steady_read=${(System.nanoTime()-t1)/1e9}%.1f s")

// 2% increment: 8k new vectors
val inc = base.crossJoin(spark.range(4).toDF("r"))
  .select((col("vec_id") + col("r") * 10000000L + 900000000L).as("vec_id"),
    transform(col("embedding"),
      (x, i) => x + (pmod(col("vec_id") * 13 + i, lit(7)).cast("float") - 3.0f) / 997.0f)
      .as("embedding"))
inc.coalesce(4).write.mode("append").parquet(corpus)
val t2 = System.nanoTime()
val idx1 = graft.similarity.VectorIndexStore.index(spark, corpusRoot, "embeddings",
  "vec_id", "embedding", recipe)
plog.println(f"increment_8k=${(System.nanoTime()-t2)/1e9}%.1f s codes=${idx1.count()}")
rm(corpusRoot)
plog.println("=== done")
plog.close()
System.exit(0)
