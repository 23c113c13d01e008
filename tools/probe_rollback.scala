// S9.31 input: BATCH ROLLBACK at scale - a 1M-doc two-piece store
// built as base + 4 appended batches of 60k docs; retracting the last
// batch must cost O(dropped) (drop its generations + one ledger
// rename) vs the O(corpus) full rebuild the same retract cost before
// round 12. Measures: retract wall, then a forced full rebuild wall on
// the same corpus for the ratio, and asserts the served rows match the
// post-retract corpus exactly. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --driver-memory 16g -i tools/probe_rollback.scala
import java.io.{PrintWriter, FileWriter}
import org.apache.spark.sql.functions._
import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.Piece

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_rollback.plog", true), true)
plog.println("=== rollback probe " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)

val base = java.nio.file.Files.createTempDirectory("rollback_probe")
val corpus = base.resolve("docs.parquet").toString

def handle = IncrementalDocArtifact(corpus, "rbp", Seq(
  Piece("digest", (docs, _) => docs.select(col("doc_id"),
    md5(col("text")).as("dg"))),
  Piece("toks", (docs, _) => docs
    .select(explode(split(col("text"), " ")).as("tok"))
    .groupBy("tok").agg(count(lit(1)).as("n")),
    fold = Some(_.groupBy("tok").agg(sum("n").as("n"))))),
  compactEvery = 0)

val B = 60000
def write(b: Int, mode: String): Unit =
  spark.range(b.toLong * B, (b + 1).toLong * B)
    .select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 30).map(i => concat(lit("w"),
        pmod(hash(col("id") + i * 7919), lit(50000)))): _*).as("text"))
    .repartition(4).write.mode(mode).parquet(corpus)

def timed(label: String)(f: => Unit): Double = {
  val t0 = System.nanoTime; f
  val w = (System.nanoTime - t0) / 1e9
  plog.println(f"$label wall=$w%.2f s"); w
}

// base = 13 batches (780k docs), then 4 advanced batches (240k more)
(0 until 13).foreach(b => write(b, if (b == 0) "overwrite" else "append"))
timed("initial build (780k docs)")(handle.serve(spark, "digest").count())
val batchFiles = (13 until 17).map { b =>
  val before = {
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(corpus))
    try { import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSet } finally s.close()
  }
  write(b, "append")
  timed(s"advance batch $b (60k docs)")(
    handle.serve(spark, "digest").count())
  val s = java.nio.file.Files.list(java.nio.file.Paths.get(corpus))
  try { import scala.jdk.CollectionConverters._
    s.iterator().asScala.toSet -- before } finally s.close()
}

// RETRACT the last batch: O(dropped)
val retract = timed("retract batch 16 (rollback)") {
  batchFiles.last.foreach(java.nio.file.Files.delete)
  assert(handle.serve(spark, "digest").count() == 16L * B)
}
// retract two more batches in one step (both are whole generations)
val retract2 = timed("retract batches 14+15 (one rollback)") {
  (batchFiles(1) ++ batchFiles(2)).foreach(java.nio.file.Files.delete)
  assert(handle.serve(spark, "digest").count() == 14L * B)
}
// comparison point: force the O(corpus) path by touching a base file's
// mtime (fingerprint change that is not append/removal-only)
val rebuild = timed("full rebuild (same corpus, forced)") {
  handle.rebuild(spark)
  assert(handle.serve(spark, "digest").count() == 14L * B)
}
plog.println(f"ratio rebuild/retract=${rebuild / retract}%.1fx")
plog.println("=== done")
plog.close()
System.exit(0)
