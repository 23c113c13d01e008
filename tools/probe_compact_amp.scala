// S9.20 probe: read amplification vs live delta-generation count -
// the r9 verdict's item #7. Every base+delta artifact defaults to
// compactEvery = 8 with no measurement behind it: this measures
// serve/screen latency at 0..8 live generations for the text index
// (BM25 query), the prefix store (Jaccard screen) and the edit store
// (Levenshtein screen) at 500k docs, and the cost/payoff of the
// automatic fold at the 8th increment. ASCII only (spark-shell -i).
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_compact_amp.plog", true), true)
plog.println("=== compact amplification probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)

def rm(p: String): Unit = {
  val d = java.nio.file.Paths.get(p)
  if (java.nio.file.Files.exists(d)) {
    val s = java.nio.file.Files.walk(d)
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]()).forEach(f => java.nio.file.Files.delete(f))
    finally s.close()
  }
}
def wall[A](f: => A): (Double, A) = {
  val t0 = System.nanoTime; val r = f; ((System.nanoTime - t0) / 1e9, r)
}

val sfRoot = "/root/repo/target/probe_camp"
val docsPath = sfRoot + "/documents.parquet"
val partPath = sfRoot + "/part.parquet"
rm(sfRoot)
val gidx = "/root/repo/target/graft_index/"
Seq("_inc3", "_prefix2_9_10", "_tfidf1024").foreach(k =>
  rm(gidx + graft.sources.ArtifactStore.pathKey(docsPath) + k))
rm(gidx + graft.sources.ArtifactStore.pathKey(partPath) + "_pname_2")

// 500k docs / 500k short strings
val V = 50000.0; val L = 40
def tok(idCol: org.apache.spark.sql.Column, i: Int) =
  concat(lit("w"), (conv(substring(md5(concat(idCol.cast("string"), lit("_" + i))), 1, 6), 16, 10).cast("long") % V.toLong).cast("string"))
spark.range(500000L).select(col("id").as("doc_id"),
    concat_ws(" ", (0 until L).map(i => tok(col("id"), i)): _*).as("text"))
  .repartition(32).write.parquet(docsPath)
spark.range(500000L).select(col("id").as("p_partkey"),
    concat(lit("part "), substring(md5(col("id").cast("string")), 1, 12),
      lit(" "), (col("id") % 97).cast("string")).as("p_name"))
  .repartition(32).write.parquet(partPath)

def bm25Serve(): Long = {
  val post = graft.functions.TextIndexStore.postings(spark, sfRoot)
  graft.functions.TextSearch.bm25OverPostings(post, "doc_id",
    Seq("w123", "w4567", "w31999")).count()
}
def prefixServe(): Long = {
  val b = spark.range(9000000L, 9000100L).select(col("id").as("doc_id"),
    concat_ws(" ", (0 until L).map(i => tok(col("id") % 500000L, i)): _*).as("text"))
  graft.dedup.PrefixStore.screen(spark, sfRoot, "documents", b, "doc_id", 9, 10).count()
}
def editServe(): Long = {
  val b = spark.range(9000000L, 9000100L).select((-(col("id") + 1)).as("sid"),
    concat(lit("part "), substring(md5((col("id") % 500000L).cast("string")), 1, 11),
      lit(" "), (col("id") % 97).cast("string")).as("s"))
  graft.dedup.EditStore.screen(spark, partPath, "pname", "p_partkey",
    lower(col("p_name")), b, "sid", col("s"), k = 2).count()
}

plog.println("gens | text bm25 s | prefix screen s | edit screen s | (advance s: text/prefix/edit)")
var advT = 0.0; var advP = 0.0; var advE = 0.0
for (g <- 0 to 8) {
  if (g > 0) {
    // tiny append: 200 docs / 200 strings per generation
    spark.range(1000000L + g * 1000L, 1000000L + g * 1000L + 200L)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until L).map(i => tok(col("id"), i)): _*).as("text"))
      .coalesce(1).write.mode("append").parquet(docsPath)
    spark.range(1000000L + g * 1000L, 1000000L + g * 1000L + 200L)
      .select(col("id").as("p_partkey"),
        concat(lit("part "), substring(md5(col("id").cast("string")), 1, 12),
          lit(" "), (col("id") % 97).cast("string")).as("p_name"))
      .coalesce(1).write.mode("append").parquet(partPath)
    // advance cost (includes the automatic fold when the count hits 8)
    advT = wall(bm25Serve())._1
    advP = wall(prefixServe())._1
    advE = wall(editServe())._1
  } else { bm25Serve(); prefixServe(); editServe() } // initial builds untimed here
  val (t1, _) = wall(bm25Serve())
  val (t2, _) = wall(prefixServe())
  val (t3, _) = wall(editServe())
  plog.println(f"$g%4d | $t1%11.2f | $t2%15.2f | $t3%13.2f | ($advT%.1f/$advP%.1f/$advE%.1f)")
}
plog.println("note: generation 8's advance row includes the automatic compactEvery=8 fold; the g=8 serve row is post-fold")
System.exit(0)
