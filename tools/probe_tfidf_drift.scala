// S9.29 input: the TfIdfStore drift CHECK at scale. Round 10's
// refreshIfDrifted re-vectorized the whole corpus to decide whether to
// re-vectorize; round 11 gates on driftBound - a fold over the stored
// (tok, tfsum, idfp) ledger. This measures both at 100k and 1M docs
// (same 20k vocab): the bound's cost should track |vocab| x gens, not
// corpus size, while the exact report's cost tracks the corpus.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   --driver-memory 24g -i tools/probe_tfidf_drift.scala
import java.io.{PrintWriter, FileWriter}
import java.nio.file.{Files, Paths, Path}
import java.util.Comparator
import org.apache.spark.sql.functions._
import graft.functions.TfIdfStore

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_tfidf_drift.plog", true), true)
plog.println("=== tfidf drift probe " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)

def dt(p: String): Unit = {
  val d = Paths.get(p)
  if (Files.exists(d)) {
    val s = Files.walk(d)
    try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    finally s.close()
  }
}

def docs(lo: Long, hi: Long) = spark.range(lo, hi)
  .select(col("id").as("doc_id"),
    concat_ws(" ", (0 until 30).map(i =>
      concat(lit("w"), pmod(hash(col("id") + i * 7919), lit(20000)))): _*)
      .as("text"))

def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime
  val r = f
  plog.println(f"$label: ${(System.nanoTime - t0) / 1e9}%.1f s")
  r
}

for (n <- Seq(100000L, 1000000L)) {
  val sf = s"/tmp/probe_drift_$n"
  dt(sf)
  dt(graft.sources.ArtifactStore.root + "/" +
    graft.sources.ArtifactStore.pathKey(s"$sf/documents.parquet") + "_tfidf1024")
  docs(0, n).repartition(8).write.parquet(s"$sf/documents.parquet")
  timed(s"[$n] store build")(TfIdfStore.features(spark, sf).count())
  // 1% append -> one pinned generation of drift
  docs(n, n + n / 100).coalesce(2).write.mode("append")
    .parquet(s"$sf/documents.parquet")
  timed(s"[$n] advance (1% append)")(TfIdfStore.features(spark, sf).count())
  val b = timed(s"[$n] driftBound (artifact-only)")(
    TfIdfStore.driftBound(spark, sf).head)
  plog.println(s"[$n]   bound_mean=${b.getDouble(0)} mass=${b.getDouble(1)}")
  val e = timed(s"[$n] driftReport (exact, re-vectorizes)")(
    TfIdfStore.driftReport(spark, sf).head)
  plog.println(s"[$n]   exact max=${e.getDouble(0)} mean=${e.getDouble(1)}")
}
plog.println("=== done")
System.exit(0)
