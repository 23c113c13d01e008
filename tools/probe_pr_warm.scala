// S9.18 probe: warm-start PageRank at 2M edges - cold-to-convergence
// vs warm-start-after-1%-append, iterations and wall, through both
// the direct API and the stored artifact. ASCII only.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_pr_warm.plog", true), true)
plog.println("=== pagerank warm probe " + java.time.Instant.now)
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

val U = 200000.0
val edgesPath = "/root/repo/target/probe_pr/edges.parquet"
rm("/root/repo/target/probe_pr")
rm("/root/repo/target/graft_index/" + graft.sources.ArtifactStore.pathKey(edgesPath) + "_pagerank_d0p85_t1p0Em8")
def edgeDf(nEdges: Long, seed: Long) = spark.range(nEdges).select(
  concat(lit("u"), floor(pow(lit(U), rand(seed))).cast("long").cast("string")).as("src"),
  concat(lit("u"), floor(pow(lit(U), rand(seed + 1))).cast("long").cast("string")).as("dst"))
edgeDf(2000000L, 11L).repartition(32).write.parquet(edgesPath)

import graft.operators.{PageRank, PageRankStore}
val tol = 1e-8
timed("store_cold_build_2M_edges") {
  PageRankStore.ranks(spark, edgesPath, tol).count()
}
timed("store_serve_warm") {
  PageRankStore.ranks(spark, edgesPath, tol).count()
}
// the PRE-append vector: what the advance will warm-start from
val preRanks = PageRankStore.ranks(spark, edgesPath, tol).localCheckpoint()
// 1% append
timed("append_20k_edges") {
  edgeDf(20000L, 99L).repartition(1).write.mode("append").parquet(edgesPath)
}
timed("store_warm_advance") {
  PageRankStore.ranks(spark, edgesPath, tol).count()
}
// iteration counts on the grown graph: cold vs warm-from-pre-append
val all = spark.read.parquet(edgesPath)
val (cold, coldIters) = timed("cold_converged_grown") {
  PageRank.converged(spark, all, None, tol)
}
val (warm, warmIters) = timed("warm_converged_grown") {
  PageRank.converged(spark, all, Some(preRanks), tol)
}
plog.println(s"iterations cold=$coldIters warm_from_stored=$warmIters")
val maxDiff = warm.withColumnRenamed("pr", "w")
  .join(cold.withColumnRenamed("pr", "c"), "node")
  .agg(max(abs(col("w") - col("c")))).head.getDouble(0)
plog.println(f"max_abs_rank_diff=$maxDiff%.2e (both inside tol of the fixpoint)")
plog.println("done")
