// S9.38 input: TWO artifact families maintaining themselves over ONE
// growing corpus dir -- the accept loop's screen artifact AND the
// co-occurrence graph store, both keyed by acceptedCorpusPath. The
// claim under test: the composition stays per-batch FLAT (accept tick
// AND co-occur advance), folds stay detached, the writer-lease /
// stamp machinery of the two families over the same corpus never
// interferes, and the graph state (coreness/communities) serves over
// the ACCEPTED set. ~1M offered docs, 20% duplicate re-offers.
//
// Corpus shape (printed below, per the probe-construction rule):
//  - g = floor(doc_id/8): bounded groups, ~8 docs each, so the pair
//    expansion per tick is O(batch), never O(corpus);
//  - item = doc_id % 40000: item blocks RECUR across batches under
//    fresh groups, so pair counts climb past the graph family's
//    minCount=2 cut -- the served graph is nonempty and growing in
//    WEIGHT while bounded in nodes (40k items, 8-cliques).
// Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --driver-memory 16g -i tools/probe_accept_cooc.scala
import java.io.{PrintWriter, FileWriter}
import org.apache.spark.sql.functions._

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_accept_cooc.plog", true), true)
plog.println("=== accept->cooc composed probe " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)

val out = "/tmp/accept_cooc_probe"
new java.lang.ProcessBuilder("rm", "-rf", out).start().waitFor()
val nBatches = 100
val perBatch = 10000
val newPer = perBatch * 4 / 5
val corpus = graft.streaming.StreamingAcceptIngest.acceptedCorpusPath(out)

// dup texts reproduce an EARLIER batch's exact text under fresh ids
// (uniform over the whole accepted history)
def dupsFrom(b: Int) = {
  val n = perBatch - newPer
  graft.streaming.StreamingAcceptIngest.accepted(spark, out)
    .select(col("text"), col("fp"))
    .orderBy(pmod(hash(col("fp"), lit(b)), lit(1000000)), col("fp"))
    .limit(n)
    .withColumn("doc_id", monotonically_increasing_id()
      + b.toLong * perBatch + 900000000L)
    .select("doc_id", "text")
}

val wAccept = new Array[Double](nBatches)
val wCooc = new Array[Double](nBatches)
for (b <- 0 until nBatches) {
  val gid = col("id") + b.toLong * newPer
  val fresh = spark.range(newPer).select(
    (gid + 1000000L).as("doc_id"),
    concat(lit("doc "), gid, lit(" body "),
      pmod(hash(gid + b * 7919), lit(1000))).as("text"))
  val df = (if (b == 0) fresh else fresh.unionByName(dupsFrom(b)))
    .withColumn("g", floor(col("doc_id") / 8L))
    .withColumn("item", col("doc_id") % 40000L)
    .localCheckpoint()
  var t0 = System.nanoTime
  graft.streaming.StreamingAcceptIngest.applyBatch(
    df, b.toLong, "doc_id", "text", out, expectedItems = 4000000L)
  wAccept(b) = (System.nanoTime - t0) / 1e9
  t0 = System.nanoTime
  graft.operators.CoOccurStore.ingestTick(spark, corpus, "g", "item")
  wCooc(b) = (System.nanoTime - t0) / 1e9
  if ((b + 1) % 25 == 0) {
    val t1 = System.nanoTime
    val ne = graft.operators.CoOccurStore
      .weightedEdgesAt(spark, corpus, "g", "item", 2L).count()
    val we = (System.nanoTime - t1) / 1e9
    val t2 = System.nanoTime
    val nc = graft.operators.CoOccurStore
      .corenessAt(spark, corpus, "g", "item").count()
    val wc = (System.nanoTime - t2) / 1e9
    plog.println(f"serve after batch $b: edges(minCount=2)=$ne " +
      f"(${we}%.2f s) coreness_nodes=$nc (${wc}%.2f s)")
  }
}
for (d <- 0 until nBatches / 10) {
  val a = wAccept.slice(d * 10, d * 10 + 10)
  val c = wCooc.slice(d * 10, d * 10 + 10)
  plog.println(f"decade $d: accept mean=${a.sum / a.length}%.2f s " +
    f"max=${a.max}%.2f s | cooc mean=${c.sum / c.length}%.2f s " +
    f"max=${c.max}%.2f s")
}
val acc = graft.streaming.StreamingAcceptIngest.accepted(spark, out)
val nAcc = acc.count()
val nDis = acc.select("fp").distinct().count()
plog.println(s"accepted=$nAcc distinct_fp=$nDis (must be equal)")
// corpus-shape invariants the claims above depend on
val shape = acc.agg(countDistinct(col("g")).as("groups"),
  countDistinct(col("item")).as("items")).head
plog.println(s"groups=${shape.getLong(0)} items=${shape.getLong(1)} " +
  "(bounded-clique shape: items fixed at 40000, groups ~ accepted/8)")
val comm = graft.operators.CoOccurStore
  .communitiesAt(spark, corpus, "g", "item").count()
plog.println(s"community_nodes=$comm")
graft.operators.CoOccurStore.awaitMaintenance(corpus, "g", "item")
plog.println("accept stats: " +
  graft.streaming.StreamingAcceptIngest.AcceptStats.snapshot)
plog.println("maint: " +
  graft.sources.IncrementalDocArtifact.Maintenance.snapshot)
plog.println("=== done")
plog.close()
System.exit(0)
