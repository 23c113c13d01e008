// S9.35 input: the streaming co-occurrence sink's per-batch ingest
// cost as the sink GROWS -- the round-13 verdict's #1 done-criterion.
// Round 13's sink pre-viewed ALL prior ingested rows per batch
// (unclustered _batch partitions: O(history) per tick, growing with
// sink age). Round 14 lands batches as corpus generations of the
// batch artifact, whose g-clustered fold makes the affected-groups
// pre-view row-group-pruned -- per-batch cost must be FLAT in sink
// age: decade means at 10x the ingested volume ~= the first decade's.
// Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --driver-memory 16g -i tools/probe_stream_cooc.scala
import java.io.{PrintWriter, FileWriter}
import org.apache.spark.sql.functions._

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_stream_cooc.plog", true), true)
plog.println("=== streaming co-occur ingest probe " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)

val out = "/tmp/stream_cooc_probe"
new java.lang.ProcessBuilder("rm", "-rf", out).start().waitFor()
val sink = s"$out/cooc"

// 80 equal batches -> the sink's ingested volume grows 80x over the
// run (10x is crossed at batch 10 vs batch 1, and again at 80 vs 8).
// Each batch: 200 groups x 40 items; the group id STRIDE is 20 less
// than the group count, so each batch's first 20 groups ARE the
// previous batch's last 20 (cross-batch baskets -- the
// affected-groups pre-view path actually matches prior rows); items
// zipf-ish over 30k ids so popular pairs cross the cut.
val nBatches = 80
val groupsPer = 200
val itemsPer = 40

def batchDF(id: Int) = {
  val base = id.toLong * (groupsPer - groupsPer / 10)
  spark.range(groupsPer).select(
      (col("id") + base).as("g"),
      explode(sequence(lit(1), lit(itemsPer))).as("k"))
    .select(col("g"),
      (pmod(hash(col("g") * lit(31) + col("k")), lit(30000)) +
        pmod(hash(col("k")), lit(40))).cast("long").as("i"))
    .localCheckpoint()
}

val walls = new Array[Double](nBatches)
for (b <- 0 until nBatches) {
  val df = batchDF(b)
  val t0 = System.nanoTime
  graft.streaming.StreamingCoOccur.applyBatch(df, b.toLong, "g", "i", sink)
  walls(b) = (System.nanoTime - t0) / 1e9
}
// decade summary: mean/max per 10 batches. FLAT = later decades in
// the first decade's band (first batch pays the artifact bootstrap).
for (d <- 0 until nBatches / 10) {
  val w = walls.slice(d * 10, d * 10 + 10)
  plog.println(f"decade $d batches ${d*10}-${d*10+9}: mean=${w.sum / w.length}%.2f s max=${w.max}%.2f s")
}
plog.println(f"batch0 (bootstrap)=${walls(0)}%.2f s; batch1=${walls(1)}%.2f s")
graft.streaming.StreamingCoOccur.awaitMaintenance(sink)
val edges = graft.streaming.StreamingCoOccur.weightedEdges(spark, sink, 2L)
val t0 = System.nanoTime
val n = edges.count()
plog.println(f"final serve (cut 2): $n edges in ${(System.nanoTime - t0) / 1e9}%.2f s")
plog.println("maint: " + graft.sources.IncrementalDocArtifact.Maintenance.snapshot)
plog.println("=== done")
plog.close()
System.exit(0)
