// S9.22: time-partitioned stored event sketches at 100x events (6M
// rows, 100x user space). Inline q38-shape sliding HLL (re-scan the
// stream per dashboard run) vs q52's EventSketchStore-served form
// (merge <=64 stored register rows per day), plus the 1% append cost.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   --driver-memory 24g -i tools/probe_event_sketch.scala
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_event_sketch.plog", true), true)
plog.println("=== event sketch store probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

val corpusDir = "/tmp/evsk_probe"
val corpus = s"$corpusDir/events.parquet"
new java.lang.ProcessBuilder("rm", "-rf", corpusDir).start().waitFor()

// 100x replication of sf0.1 events with user-space growth: distinct
// counts grow with the corpus, as they would in production.
val base = graft.core.Tables.loadEvents(spark, "/root/testdata/sf0.1")
  .select(col("event_id"), col("user_id"), col("ts"))
val big = base.crossJoin(spark.range(99).toDF("r"))
  .select((col("event_id") + col("r") * 10000000L).as("event_id"),
    (col("user_id") + col("r") * 1000000L).as("user_id"), col("ts"))
  .repartition(32)
big.write.mode("overwrite").parquet(corpus)
val n = spark.read.parquet(corpus).count()
plog.println(s"events=$n")

def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

import graft.sketch.{EventSketchStore, HyperLogLog}

def slidingFromRegisters(daily: org.apache.spark.sql.DataFrame) = {
  val days = daily.select("day").distinct().withColumnRenamed("day", "wd")
  val windowed = daily
    .withColumn("wd", explode(sequence(col("day"), col("day") + 6)))
    .join(broadcast(days), Seq("wd"), "left_semi")
    .groupBy("wd", "register").agg(max("r").as("r"))
  HyperLogLog.estimate(windowed, keys = Seq("wd"))
}

// inline form: the stream is rescanned per dashboard run
def inlineDaily() = {
  val active = graft.core.Tables.normalizeEvents(spark.read.parquet(corpus))
    .select(expr("unix_millis(ts) div 86400000").as("day"), col("user_id"))
    .distinct()
  HyperLogLog.build(
    active.select(col("day"), col("user_id").cast("string").as("item")),
    col("item"), keys = Seq("day"))
}
for (i <- 1 to 2)
  timed(s"inline_sliding_$i") { slidingFromRegisters(inlineDaily()).count() }

// stored form: first call builds the artifact, later calls serve it
timed("store_build") { EventSketchStore.dayRegisters(spark, corpusDir).count() }
for (i <- 1 to 2)
  timed(s"stored_sliding_$i") {
    slidingFromRegisters(EventSketchStore.dayRegisters(spark, corpusDir)).count()
  }
val regRows = EventSketchStore.dayRegisters(spark, corpusDir).count()
plog.println(s"stored_register_rows=$regRows")

// 1% append (some late for existing days, some a brand-new day)
val app = base.limit(6000)
  .select((col("event_id") + 990000000L).as("event_id"),
    (col("user_id") + 99000000L).as("user_id"),
    (col("ts") + expr("INTERVAL 40 DAYS")).as("ts"))
app.coalesce(2).write.mode("append").parquet(corpus)
timed("append_advance") { EventSketchStore.dayRegisters(spark, corpusDir).count() }
timed("stored_sliding_after_append") {
  slidingFromRegisters(EventSketchStore.dayRegisters(spark, corpusDir)).count()
}
plog.println("done")
System.exit(0)
