// S9.21 probe: stored sketch artifact (SketchStore) at 1M docs -
// profile-card serve latency from stored partials vs inline corpus
// recompute, and the O(new) append cost. ASCII only (spark-shell -i).
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_sketch_store.plog", true), true)
plog.println("=== sketch store probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sketch.{CountMin, HyperLogLog, LogHistogram, SketchStore}
spark.conf.set("spark.sql.shuffle.partitions", 32)

def rm(p: String): Unit = {
  val d = java.nio.file.Paths.get(p)
  if (java.nio.file.Files.exists(d)) {
    val s = java.nio.file.Files.walk(d)
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]()).forEach(f => java.nio.file.Files.delete(f))
    finally s.close()
  }
}
def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

val sfRoot = "/root/repo/target/probe_sketch"
val corpus = sfRoot + "/documents.parquet"
val artDir = "/root/repo/target/graft_index/" + graft.sources.ArtifactStore.pathKey(corpus) + "_sk1"
rm(sfRoot); rm(artDir)

// 1M docs, 30-50 tokens over a 50k vocab, 4 sources, 3 langs
val V = 50000L
def tok(idCol: org.apache.spark.sql.Column, i: Int) =
  concat(lit("w"), (conv(substring(md5(concat(idCol.cast("string"), lit("_" + i))), 1, 6), 16, 10).cast("long") % V).cast("string"))
def docsOf(r: org.apache.spark.sql.Dataset[java.lang.Long]) = r.select(
  col("id").as("doc_id"),
  concat_ws(" ", (0 until 40).map(i => tok(col("id"), i)): _*).as("text"),
  concat(lit("lang"), (col("id") % 3).cast("string")).as("lang"),
  concat(lit("src"), (col("id") % 4).cast("string")).as("source"))
timed("corpus write (1M docs)") {
  docsOf(spark.range(1000000L)).repartition(64).write.parquet(corpus)
}

def inlineProfile(): Long = {
  val d = spark.read.parquet(corpus)
  val toks = d.select(col("source"), explode(
    TextFunctions.tokens(TextFunctions.normalize(col("text")))).as("term"))
  val hll = HyperLogLog.estimate(
    HyperLogLog.build(toks, col("term"), keys = Seq("source")), keys = Seq("source"))
  val card = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
  val hist = LogHistogram.quantiles(LogHistogram.build(
    d.select(TextFunctions.tokenCount(TextFunctions.normalize(col("text"))).cast("double").as("t")), col("t")),
    Seq(0.5, 0.9, 0.99))
  hll.join(card, "source").count() + hist.count()
}

def storedProfile(): Long = {
  val hll = HyperLogLog.estimate(SketchStore.hll(spark, sfRoot, "documents"), keys = Seq("source"))
  val card = SketchStore.card(spark, sfRoot, "documents")
    .groupBy("source").agg(sum("n_docs").as("n_docs"))
  val hist = LogHistogram.quantiles(SketchStore.tokenHist(spark, sfRoot, "documents"), Seq(0.5, 0.9, 0.99))
  hll.join(card, "source").count() + hist.count()
}

// (a) inline recompute, the pre-store shape - run twice (cold/warm)
timed("inline profile card #1 (corpus recompute)") { inlineProfile() }
timed("inline profile card #2 (corpus recompute)") { inlineProfile() }

// (b) stored: one-off build, then serves are artifact scans
timed("store build (one-off: cms+hll+hist+card partials)") {
  SketchStore.card(spark, sfRoot, "documents").count()
}
timed("stored profile card #1") { storedProfile() }
timed("stored profile card #2") { storedProfile() }
timed("stored profile card #3") { storedProfile() }

// (c) 1% append: advance cost is O(new)
timed("1% append: corpus write") {
  docsOf(spark.range(1000000L, 1010000L)).repartition(2).write.mode("append").parquet(corpus)
}
timed("1% append: sketch advance + serve") { storedProfile() }

// (d) estimate quality unchanged by store route (sanity)
val probeTerms = (0 until 10).map(i => "w" + (i * 137)).toDF("term")
val est = CountMin.estimate(SketchStore.cms(spark, sfRoot, "documents"), probeTerms, "term",
  SketchStore.Depth, SketchStore.Width)
plog.println("cms probe estimates: " + est.orderBy("term").collect().mkString(", "))

plog.println("done")
System.exit(0)
