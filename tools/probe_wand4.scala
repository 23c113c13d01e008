// S9.18 probe part 4: bm25 clustered fixture under the scan-floor
// adaptive gate (expect fallback: pruned ~ naive + ceiling overhead,
// not the 26.8 s mispredicted plan). ASCII only.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_wand4.plog", true), true)
plog.println("=== wand probe 4 " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)
def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}
import graft.functions.{TextSearch, TextFunctions}
val V = 50000.0
val hot = (0 until 20).map(i =>
  concat(lit("w"), floor(pow(lit(V), rand(3100L + i))).cast("long").cast("string")))
def rareTok(i: Int) = concat(lit("r"),
  substring(md5(concat((col("id") % 100000L).cast("string"), lit("_" + i))), 1, 10))
val rare = (0 until 10).map(rareTok)
val perturbed = concat(lit("px"), (col("id") % 9L).cast("string"))
val text = concat_ws(" ", (hot ++ rare.dropRight(1) :+ perturbed): _*)
val docs = spark.range(1000000L).select(col("id").as("doc_id"), text.as("text")).localCheckpoint()
docs.count()
val post = TextSearch.postings(docs, "doc_id", TextFunctions.normalize(col("text"))).localCheckpoint()
post.count()
val stats = TextSearch.corpusStats(post, "doc_id").localCheckpoint()
val bounds = TextSearch.termBounds(post).localCheckpoint()
bounds.count()
val toks = TextFunctions.tokens(TextFunctions.normalize(col("text")))
val queries = docs.where(col("doc_id") % 10000L === 0L)
  .select(col("doc_id").as("query_id"),
    explode(array_distinct(array(element_at(toks, 1), element_at(toks, 21), element_at(toks, 25)))).as("term"))
  .localCheckpoint()
val bN = timed("bm25_naive_clustered") {
  TextSearch.bm25TopKBatch(post, "doc_id", queries, k = 10, stats = Some(stats)).count()
}
val bP = timed("bm25_pruned_clustered_scanfloor") {
  TextSearch.bm25TopKBatchPruned(post, "doc_id", queries, k = 10, bounds, stats).count()
}
plog.println(s"rows naive=$bN pruned=$bP (equal expected; scan-floor fallback)")
plog.println("done")
