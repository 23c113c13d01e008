// S9.29 input: ingest-tick latency across the fold boundary after the
// round-11 detached-compaction change. A two-piece artifact (digest +
// postings, the screen-store shape) takes 24 appends of 20k docs with
// compactEvery=8; per tick we record the serve latency. Before r11 the
// 8th/16th/24th tick paid the fold inline (the S9.20 latency cliff);
// now the fold runs on the maintenance pool and every tick should sit
// in one band. For contrast we also time one explicit synchronous
// compact() at the end - the cost that used to ride a tick.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   --driver-memory 24g -i tools/probe_async_compact.scala
import java.io.{PrintWriter, FileWriter}
import java.nio.file.{Files, Paths, Path}
import java.util.Comparator
import org.apache.spark.sql.functions._
import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.Piece

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_async_compact.plog", true), true)
plog.println("=== async compact probe " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)

def dt(p: String): Unit = {
  val d = Paths.get(p)
  if (Files.exists(d)) {
    val s = Files.walk(d)
    try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    finally s.close()
  }
}
val corpus = "/tmp/probe_async_corpus/documents.parquet"
dt("/tmp/probe_async_corpus")
dt(graft.sources.ArtifactStore.root + "/" +
  graft.sources.ArtifactStore.pathKey(corpus) + "_asyncp1")

def handle() = IncrementalDocArtifact(corpus, "asyncp1", Seq(
  Piece("digest", (docs, _) => docs.select(col("doc_id"),
    md5(col("text")).as("dg"))),
  Piece("postings", (docs, _) => docs.select(col("doc_id"),
    explode(split(col("text"), " ")).as("tok"))
    .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")))),
  compactEvery = 8)

val BATCH = 20000
def mkBatch(b: Int) = spark.range(b.toLong * BATCH, (b + 1).toLong * BATCH)
  .select(col("id").as("doc_id"),
    concat_ws(" ", (0 until 30).map(i =>
      concat(lit("w"), pmod(hash(col("id") + i * 7919), lit(5000)))): _*)
      .as("text"))

val times = scala.collection.mutable.ArrayBuffer[Double]()
for (b <- 0 until 24) {
  mkBatch(b).coalesce(2).write.mode("append").parquet(corpus)
  val t0 = System.nanoTime
  val n = handle().serve(spark, "digest").count()
  val ms = (System.nanoTime - t0) / 1e6
  times += ms
  plog.println(f"tick $b%02d  rows=$n%d  serve_ms=$ms%.0f")
}
val sorted = times.sorted
plog.println(f"ticks=24 p50=${sorted(11)}%.0f ms p95=${sorted(22)}%.0f ms max=${sorted.last}%.0f ms")
// join any in-flight fold, then show what a synchronous fold costs -
// the latency that used to land on the 8th tick
val h = handle()
h.awaitMaintenance()
// force one more generation then compact synchronously for contrast
mkBatch(24).coalesce(2).write.mode("append").parquet(corpus)
h.serve(spark, "digest").count()
val t0 = System.nanoTime
h.compact(spark)
plog.println(f"explicit synchronous compact: ${(System.nanoTime - t0) / 1e6}%.0f ms (the cost moved off the tick path)")
// generation bound held: count live _gen dirs
val dDir = Paths.get(graft.sources.ArtifactStore.root,
  graft.sources.ArtifactStore.pathKey(corpus) + "_asyncp1", "digest", "delta")
val liveGens = if (Files.exists(dDir)) {
  val s = Files.list(dDir)
  try s.filter(_.getFileName.toString.startsWith("_gen=")).count()
  finally s.close()
} else 0L
plog.println(s"live digest delta gens after final compact: $liveGens")
plog.println("=== done")
System.exit(0)
