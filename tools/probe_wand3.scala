// S9.18 probe part 3: the regime where max-score pruning PAYS -
// retrieval against a duplicate-heavy corpus (the dedup workload):
// 100k clusters x 10 near-dup copies = 1M docs; each doc mixes 20
// Zipf (hot) tokens + 10 cluster-specific rare tokens. The k-th best
// score is set by cluster mates (high theta), hot buckets go
// inessential, candidates are the mates. Also re-measures the SPREAD
// fixture with the completion-aware adaptive check (expect fallback:
// pruned ~ naive + ceiling overhead). ASCII only.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_wand3.plog", true), true)
plog.println("=== wand probe 3 " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)
def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

import graft.functions.{HashedTfIdf, TextSearch, TextFunctions}

// ---- clustered corpus: base_id = id % 100000; 10 copies; one token
// perturbed per copy so mates are near- but not exact dups
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

val f = timed("features_clustered") {
  val d = HashedTfIdf.sparseFeatures(docs, "doc_id", col("text"), dim = 32768)
  d.count(); d.localCheckpoint()
}
val qf = f.where(col("doc_id") % 10000L === 0L)
  .withColumnRenamed("doc_id", "query_id").localCheckpoint()
val cN = timed("cosine_naive_clustered") {
  HashedTfIdf.topKCosine(f, qf, k = 10).count()
}
val cP = timed("cosine_pruned_clustered") {
  HashedTfIdf.topKCosinePruned(f, qf, k = 10).count()
}
plog.println(s"cosine clustered rows naive=$cN pruned=$cP (equal expected)")

val post = timed("postings_clustered") {
  val p = TextSearch.postings(docs, "doc_id", TextFunctions.normalize(col("text")))
  p.count(); p.localCheckpoint()
}
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
val bP = timed("bm25_pruned_clustered") {
  TextSearch.bm25TopKBatchPruned(post, "doc_id", queries, k = 10, bounds, stats).count()
}
plog.println(s"bm25 clustered rows naive=$bN pruned=$bP (equal expected)")

// ---- spread fixture re-check: the completion-aware adaptive must
// now FALL BACK (pruned ~ naive + ceiling overhead, not 1.5x)
val text2 = concat_ws(" ", (0 until 30).map(i =>
  concat(lit("w"), floor(pow(lit(100000.0), rand(7100L + i))).cast("long").cast("string"))): _*)
val docs2 = spark.range(1000000L).select(col("id").as("doc_id"), text2.as("text")).localCheckpoint()
val post2 = TextSearch.postings(docs2, "doc_id", TextFunctions.normalize(col("text"))).localCheckpoint()
post2.count()
val stats2 = TextSearch.corpusStats(post2, "doc_id").localCheckpoint()
val bounds2 = TextSearch.termBounds(post2).localCheckpoint()
val toks2 = TextFunctions.tokens(TextFunctions.normalize(col("text")))
val queries2 = docs2.where(col("doc_id") % 10000L === 0L)
  .select(col("doc_id").as("query_id"),
    explode(array_distinct(array(element_at(toks2, 1), element_at(toks2, 15), element_at(toks2, 30)))).as("term"))
  .localCheckpoint()
val b2N = timed("bm25_naive_spread") {
  TextSearch.bm25TopKBatch(post2, "doc_id", queries2, k = 10, stats = Some(stats2)).count()
}
val b2P = timed("bm25_pruned_spread_adaptive") {
  TextSearch.bm25TopKBatchPruned(post2, "doc_id", queries2, k = 10, bounds2, stats2).count()
}
plog.println(s"bm25 spread rows naive=$b2N pruned=$b2P (equal expected; fallback engaged)")
plog.println("done")
