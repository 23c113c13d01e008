// S9.31 input: maintenance-pool backlog under a multi-store fold
// burst. Four two-piece stores are advanced 16 ticks each in
// round-robin at compactEvery=4 (so every 4th round ALL FOUR stores
// cross the fold threshold together and queue behind the default
// 2-thread pool). Measures per-tick ingest latency p50/p95/max per
// store (the detached-maintenance contract: no tick pays a fold
// inline, so p95 must stay near p50 through the bursts) and dumps the
// Maintenance metrics (completions, durations, queue peak) plus the
// drained end state. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --driver-memory 16g -i tools/probe_maint_pool.scala
import java.io.{PrintWriter, FileWriter}
import org.apache.spark.sql.functions._
import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.{Maintenance, Piece}

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_maint_pool.plog", true), true)
plog.println("=== maintenance pool probe " + java.time.Instant.now +
  " threads=" + sys.props.getOrElse("graft.maintenance.threads", "2"))
spark.conf.set("spark.sql.shuffle.partitions", 32)
Maintenance.reset()

val base = java.nio.file.Files.createTempDirectory("maint_pool_probe")
val corpora = (0 until 4).map(i => base.resolve(s"c$i/docs.parquet").toString)

def handle(corpus: String) = IncrementalDocArtifact(corpus, "mp1", Seq(
  Piece("digest", (docs, _) => docs.select(col("doc_id"),
    md5(col("text")).as("dg"))),
  Piece("toks", (docs, _) => docs
    .select(explode(split(col("text"), " ")).as("tok"))
    .groupBy("tok").agg(count(lit(1)).as("n")),
    fold = Some(_.groupBy("tok").agg(sum("n").as("n"))))),
  compactEvery = 4)

val B = 6000
def append(corpus: String, tick: Int, store: Int): Unit =
  spark.range(tick.toLong * B, (tick + 1).toLong * B)
    .select((col("id") + store.toLong * 100000000L).as("doc_id"),
      concat_ws(" ", (0 until 20).map(i => concat(lit("w"),
        pmod(hash(col("id") + i * 7919), lit(4000)))): _*).as("text"))
    .coalesce(2).write.mode("append").parquet(corpus)

// per-store tick walls, appended round-robin: tick t hits store 0..3
// in sequence, so fold bursts from all four stores land together
val walls = Array.fill(4)(scala.collection.mutable.ArrayBuffer[Double]())
(0 until 16).foreach { t =>
  (0 until 4).foreach { s =>
    append(corpora(s), t, s)
    val t0 = System.nanoTime
    handle(corpora(s)).serve(spark, "digest").count()
    walls(s) += (System.nanoTime - t0) / 1e9
  }
  plog.println(s"round $t queue_depth=${Maintenance.queueDepth} " +
    s"snapshot=${Maintenance.snapshot.toSeq.sortBy(_._1).mkString(",")}")
}
corpora.foreach(c => handle(c).awaitMaintenance())

def pct(xs: Seq[Double], p: Double): Double = {
  val s = xs.sorted
  s((p * (s.size - 1)).round.toInt)
}
(0 until 4).foreach { s =>
  val w = walls(s).toSeq
  plog.println(f"store $s tick p50=${pct(w, 0.5)}%.3f p95=${pct(w, 0.95)}%.3f max=${w.max}%.3f s")
}
plog.println("final " + Maintenance.snapshot.toSeq.sortBy(_._1).mkString(","))
// drained: no live _gen= dirs remain under any piece of any store
corpora.foreach { c =>
  val root = java.nio.file.Paths.get(graft.sources.ArtifactStore.root,
    graft.sources.ArtifactStore.pathKey(c) + "_mp1")
  val live = Seq("digest", "toks").flatMap { p =>
    val d = root.resolve(p).resolve("delta")
    if (!java.nio.file.Files.exists(d)) Nil
    else {
      val s = java.nio.file.Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("_gen=")).toList
      } finally s.close()
    }
  }
  plog.println(s"$c live_gen_dirs=${live.size}")
}
plog.println("=== done")
plog.close()
System.exit(0)
