// S9.18 probe part 2: where max-score pruning pays. The diag run
// measured the BM25 bound keeping 2.8% of posting volume but the
// pruned plan still lost at a 100-query fleet (4 postings scans vs
// naive's 1 - fixed cost ~ scan, saved cost ~ matched volume). So:
// (a) BM25 at a 1000-query fleet, where matched volume dominates;
// (b) cosine under the production minIdf config (hot buckets dropped
// at the source - the degenerate-u(t) ceiling problem disappears
// with the degenerate buckets). ASCII only.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_wand2.plog", true), true)
plog.println("=== wand probe 2 " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)
def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

val V = 100000.0; val L = 30; val n = 1000000L
val text = concat_ws(" ", (0 until L).map(i =>
  concat(lit("w"), floor(pow(lit(V), rand(7100L + i))).cast("long").cast("string"))): _*)
val docs = spark.range(n).select(col("id").as("doc_id"), text.as("text")).localCheckpoint()

import graft.functions.{HashedTfIdf, TextSearch, TextFunctions}
val post = TextSearch.postings(docs, "doc_id", TextFunctions.normalize(col("text"))).localCheckpoint()
post.count()
val stats = TextSearch.corpusStats(post, "doc_id").localCheckpoint()
val bounds = TextSearch.termBounds(post).localCheckpoint()
bounds.count()
val toks = TextFunctions.tokens(TextFunctions.normalize(col("text")))

for (fleetMod <- Seq(10000L, 1000L)) {
  val queries = docs.where(col("doc_id") % fleetMod === 0L)
    .select(col("doc_id").as("query_id"),
      explode(array_distinct(array(element_at(toks, 1), element_at(toks, 15), element_at(toks, 30)))).as("term"))
    .localCheckpoint()
  val m = queries.select("query_id").distinct().count()
  val bmN = timed(s"bm25_naive_fleet$m") {
    TextSearch.bm25TopKBatch(post, "doc_id", queries, k = 10, stats = Some(stats)).count()
  }
  val bmP = timed(s"bm25_pruned_fleet$m") {
    TextSearch.bm25TopKBatchPruned(post, "doc_id", queries, k = 10, bounds, stats).count()
  }
  plog.println(s"bm25 fleet=$m rows naive=$bmN pruned=$bmP (equal expected)")
}

// cosine, production config: minIdf drops the no-discrimination hot
// buckets at the source; ceilings are then rare-bucket impacts
val f2 = timed("features_minidf") {
  val d = HashedTfIdf.sparseFeatures(docs, "doc_id", col("text"), dim = 32768, minIdf = 1.5)
  d.count(); d.localCheckpoint()
}
plog.println(s"feature_rows_minidf=${f2.count()}")
val qf2 = f2.where(col("doc_id") % 10000L === 0L)
  .withColumnRenamed("doc_id", "query_id").localCheckpoint()
val cN = timed("cosine_naive_minidf_fleet100") {
  HashedTfIdf.topKCosine(f2, qf2, k = 10).count()
}
val cP = timed("cosine_pruned_minidf_fleet100") {
  HashedTfIdf.topKCosinePruned(f2, qf2, k = 10).count()
}
plog.println(s"cosine minIdf rows naive=$cN pruned=$cP (equal expected)")
plog.println("done")
