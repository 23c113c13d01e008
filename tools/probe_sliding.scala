// S9.13 addendum: sliding distinct at 100x events (6M rows) - the
// day-grain dedupe form (q37) vs the naive raw-window form, and the
// HLL sketch state size (q38) vs exact day-user state.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_sliding.plog", true), true)
plog.println("=== sliding distinct probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)

// 100x replication of sf0.1 events with user-space growth so distinct
// counts scale too
val base = graft.core.Tables.loadEvents(spark, "/root/testdata/sf0.1")
  .select(col("user_id"), col("ts"))
val ev = base.crossJoin(spark.range(100).toDF("r"))
  .select((col("user_id") + col("r") * 1000000L).as("user_id"), col("ts"))
  .repartition(32).cache()
plog.println(s"events=${ev.count()} users=${ev.select("user_id").distinct().count()}")

def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

// day-grain form (q37): dedupe first, explode <=7, dedupe, count
val dayGrain = timed("day_grain_exact") {
  val active = ev.select(expr("unix_millis(ts) div 86400000").as("day"), col("user_id")).distinct()
  val days = active.select("day").distinct().withColumnRenamed("day", "wd")
  active.withColumn("wd", explode(sequence(col("day"), col("day") + 6)))
    .join(broadcast(days), Seq("wd"), "left_semi")
    .select("wd", "user_id").distinct()
    .groupBy("wd").agg(count(lit(1)).as("n")).collect()
}
plog.println(s"windows=${dayGrain.length} max_active=${dayGrain.map(_.getLong(1)).max}")

// naive form: every RAW event exploded into its windows, then distinct
val naive = timed("naive_raw_window") {
  val e = ev.select(expr("unix_millis(ts) div 86400000").as("day"), col("user_id"))
  val days = e.select("day").distinct().withColumnRenamed("day", "wd")
  e.withColumn("wd", explode(sequence(col("day"), col("day") + 6)))
    .join(broadcast(days), Seq("wd"), "left_semi")
    .select("wd", "user_id").distinct()
    .groupBy("wd").agg(count(lit(1)).as("n")).collect()
}
plog.println(s"naive matches=${naive.map(r => (r.getLong(0), r.getLong(1))).toSet == dayGrain.map(r => (r.getLong(0), r.getLong(1))).toSet}")

// HLL form (q38): sketch state vs exact state
val hll = timed("hll_sliding") {
  import graft.sketch.HyperLogLog
  val active = ev.select(expr("unix_millis(ts) div 86400000").as("day"),
    col("user_id").cast("string").as("item"))
  val daily = HyperLogLog.build(active, col("item"), keys = Seq("day")).cache()
  val nSketch = daily.count()
  val days = daily.select("day").distinct().withColumnRenamed("day", "wd")
  val est = HyperLogLog.estimate(
    daily.withColumn("wd", explode(sequence(col("day"), col("day") + 6)))
      .join(broadcast(days), Seq("wd"), "left_semi")
      .groupBy("wd", "register").agg(max("r").as("r")),
    keys = Seq("wd")).collect()
  (nSketch, est)
}
plog.println(s"sketch_rows=${hll._1} (vs day-user rows: exact state)")
val exactByWd = dayGrain.map(r => (r.getLong(0), r.getLong(1))).toMap
val errs = hll._2.map(r => math.abs(r.getDouble(1) - exactByWd(r.getLong(0))) / exactByWd(r.getLong(0)))
plog.println(f"hll rel-err mean=${errs.sum / errs.length}%.3f max=${errs.max}%.3f (m=64 -> ~13%% expected)")

plog.println("done")
plog.close()
System.exit(0)
