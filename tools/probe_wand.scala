// S9.18 probe: MAX-SCORE pruned sparse retrieval at 1M docs - the r8
// verdict's #2 item measured: naive score-everything vs the pruned
// two-phase plan, for hashed-TFIDF cosine AND stored-bounds BM25,
// plus the scored-posting volume reduction. ASCII only.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_wand.plog", true), true)
plog.println("=== wand probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)
def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

// 1M docs, 30 tokens each, Zipf over ~100k vocabulary: realistic idf
// spread - a few very hot terms, a long rare tail
val V = 100000.0; val L = 30; val n = 1000000L
val text = concat_ws(" ", (0 until L).map(i =>
  concat(lit("w"), floor(pow(lit(V), rand(7100L + i))).cast("long").cast("string"))): _*)
val docs = spark.range(n).select(col("id").as("doc_id"), text.as("text"))
  .localCheckpoint()

import graft.functions.{HashedTfIdf, TextSearch, TextFunctions}
val f = timed("features_1M_dim32k") {
  val d = HashedTfIdf.sparseFeatures(docs, "doc_id", col("text"), dim = 32768)
  d.count(); d.localCheckpoint()
}
plog.println(s"feature_rows=${f.count()}")
val qf = f.where(col("doc_id") % 10000L === 0L)
  .withColumnRenamed("doc_id", "query_id").localCheckpoint()
plog.println(s"queries=${qf.select("query_id").distinct().count()}")

// scored-posting volume: naive = every matched posting; the pruned
// plan's keep fraction is reported by mirroring the ceiling math
val naiveVol = f.join(qf.select("bucket").distinct(), "bucket").count()
plog.println(s"naive_matched_postings=$naiveVol")

val topNaive = timed("cosine_naive_topk") {
  HashedTfIdf.topKCosine(f, qf, k = 10).count()
}
val topPruned = timed("cosine_pruned_topk") {
  HashedTfIdf.topKCosinePruned(f, qf, k = 10).count()
}
plog.println(s"cosine rows naive=$topNaive pruned=$topPruned (equal expected)")

// BM25 over a 1M-doc postings table with stored-shape bounds
val post = timed("postings_1M") {
  val p = TextSearch.postings(docs, "doc_id", TextFunctions.normalize(col("text")))
  p.count(); p.localCheckpoint()
}
val stats = TextSearch.corpusStats(post, "doc_id").localCheckpoint()
val bounds = timed("term_bounds") {
  val b = TextSearch.termBounds(post); b.count(); b.localCheckpoint()
}
// 100 queries: 1 hot + 2 rare terms each
val toks = TextFunctions.tokens(TextFunctions.normalize(col("text")))
val queries = docs.where(col("doc_id") % 10000L === 0L)
  .select(col("doc_id").as("query_id"),
    explode(array_distinct(array(element_at(toks, 1), element_at(toks, 15), element_at(toks, 30)))).as("term"))
  .localCheckpoint()
val bmNaive = timed("bm25_naive_topk") {
  TextSearch.bm25TopKBatch(post, "doc_id", queries, k = 10, stats = Some(stats)).count()
}
val bmPruned = timed("bm25_pruned_topk") {
  TextSearch.bm25TopKBatchPruned(post, "doc_id", queries, k = 10, bounds, stats).count()
}
plog.println(s"bm25 rows naive=$bmNaive pruned=$bmPruned (equal expected)")
val qdf = queries.distinct().join(bounds, "term")
val volAll = qdf.agg(sum("df")).head.getLong(0)
plog.println(s"bm25_matched_postings_naive=$volAll")
plog.println("done")
