// S9.27: the d30 composed front door at 300k corpus docs - one
// FullScreen.screen call (single normalization, all stores warm) vs
// the five standalone screens a caller would otherwise string
// together. Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   --driver-memory 24g -i tools/probe_fullscreen.scala
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_fullscreen.plog", true), true)
plog.println("=== fullscreen probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)

val sfDir = "/tmp/fsp_corpus"
new java.lang.ProcessBuilder("rm", "-rf", sfDir).start().waitFor()
java.nio.file.Files.createDirectories(java.nio.file.Paths.get(sfDir))

// 300k docs, 40 tokens each over a 10k vocab (Zipf-ish via pow skew),
// with 10% exact duplicates and 10% near-duplicate perturbations
val V = 10000
val corpus = spark.range(300000).select(col("id").as("doc_id"),
    concat_ws(" ", (0 until 40).map(j =>
      concat(lit("w"), floor(pow(rand(7 + j), 3) * V).cast("int"))): _*)
      .as("text"))
  .withColumn("text",
    when(col("doc_id") % 10 === 1, // exact dup of the previous doc's seed
      concat_ws(" ", (0 until 40).map(j =>
        concat(lit("w"), floor(pow(rand(1007 + j), 3) * V).cast("int"))): _*))
      .otherwise(col("text")))
  .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
corpus.repartition(16).write.mode("overwrite")
  .parquet(s"$sfDir/documents.parquet")
plog.println(s"corpus=${spark.read.parquet(s"$sfDir/documents.parquet").count()}")

def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

// batch: 3k docs - 1.5k novel + 1.5k copies of corpus docs
val novel = spark.range(1000000, 1001500).select(col("id").as("doc_id"),
  concat_ws(" ", (0 until 40).map(j =>
    concat(lit("w"), floor(pow(rand(33 + j), 3) * V).cast("int"))): _*)
    .as("text"))
val copies = spark.read.parquet(s"$sfDir/documents.parquet")
  .where(col("doc_id") % 200 === 0).limit(1500)
  .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
val batch = novel.unionByName(copies).localCheckpoint()
plog.println(s"batch=${batch.count()}")

import graft.dedup.{Decontam, FullScreen, GramStore, IngestScreen, PrefixStore}
import graft.functions.{BigramLmStore, TextFunctions}

// first call builds every store (digest, band, prefix order/sets/
// prefix, LM counts, 5-gram store)
timed("store_builds_plus_first_screen") {
  FullScreen.screen(spark, sfDir, "documents", batch, "doc_id").count()
}
// warm composed screen, twice
for (i <- 1 to 2) timed(s"composed_screen_$i") {
  FullScreen.screen(spark, sfDir, "documents", batch, "doc_id").count()
}
// the five standalone screens a caller would string together (each
// normalizes the batch itself; stores warm)
for (i <- 1 to 2) timed(s"five_standalone_$i") {
  IngestScreen.screen(spark, sfDir, "documents", batch, "doc_id").count()
  PrefixStore.screen(spark, sfDir, "documents", batch, "doc_id", 9, 10).count()
  PrefixStore.screenContainment(spark, sfDir, "documents", batch, "doc_id", 9, 10).count()
  BigramLmStore.scoreBatch(spark, sfDir, "documents", batch, "doc_id").count()
  Decontam.reportAgainstGrams(batch
      .select(col("doc_id"), TextFunctions.normalize(col("text")).as("text")),
    GramStore.grams(spark, sfDir, "documents", n = 5),
    "doc_id", col("text"), n = 5).count()
}
plog.println("done")
System.exit(0)
