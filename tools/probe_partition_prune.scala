// S9.24: partitioned layout at 1.2M lineitem rows - static pruning
// (3-of-83 month directories) vs the flat scan, and DPP on/off over
// the same layout. Run: /opt/spark/bin/spark-shell --master 'local[32]'
//   --driver-class-path /root/repo/target/scala-2.13/classes
//   --driver-memory 24g -i tools/probe_partition_prune.scala
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_partition_prune.plog", true), true)
plog.println("=== partition prune probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)

val flatPath = "/tmp/ppr_flat"
val partPath = "/tmp/ppr_part"
new java.lang.ProcessBuilder("rm", "-rf", flatPath, partPath).start().waitFor()

// 20x lineitem, FULL row width (the pruning benefit is I/O, so the
// probe keeps the real column count); the partitioned write clusters
// each month into one file - the realistic layout at scale, where a
// month holds large files, not 32 shards of a tiny demo
val base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
val big = base.crossJoin(spark.range(20).toDF("r"))
  .withColumn("l_orderkey", col("l_orderkey") + col("r") * 100000000L)
  .drop("r")
  .withColumn("ship_month",
    (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("int"))
big.repartition(32).write.mode("overwrite").parquet(flatPath)
big.repartition(96, col("ship_month"))
  .write.mode("overwrite").partitionBy("ship_month").parquet(partPath)
plog.println(s"rows=${spark.read.parquet(flatPath).count()}")

def dirBytes(path: String, sub: String => Boolean): Long = {
  val root = java.nio.file.Paths.get(path)
  val st = java.nio.file.Files.walk(root)
  try {
    import scala.jdk.CollectionConverters._
    st.iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .filter(f => sub(root.relativize(f).toString))
      .map(java.nio.file.Files.size(_)).sum
  } finally st.close()
}

def timed(label: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime
  f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.2f s")
}

def agg3mo(df: org.apache.spark.sql.DataFrame) = df
  .where(col("ship_month").between(200001, 200003))
  .groupBy("ship_month")
  .agg(count(lit(1)).as("n"),
    round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"))

plog.println(f"flat_bytes=${dirBytes(flatPath, _ => true) / 1e6}%.1f MB pruned_bytes=${dirBytes(partPath, n => (200001 to 200003).exists(m => n.startsWith(s"ship_month=$m/"))) / 1e6}%.1f MB of ${dirBytes(partPath, _ => true) / 1e6}%.1f MB")
for (i <- 1 to 2) timed(s"flat_3mo_$i") { agg3mo(spark.read.parquet(flatPath)).collect() }
for (i <- 1 to 2) timed(s"pruned_3mo_$i") { agg3mo(spark.read.parquet(partPath)).collect() }

// DPP: months of near-ceiling orders, no literal month in the query
val months = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
  .where(col("o_totalprice") > 499800)
  .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ship_month"))
  .distinct()
plog.println(s"dim_months=${months.count()} of 83")
def dppJoin() = spark.read.parquet(partPath)
  .join(broadcast(months), Seq("ship_month"))
  .groupBy("ship_month").agg(count(lit(1)).as("n"))

spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
val dimMonths = months.collect().map(_.getInt(0)).toSet
plog.println(f"dpp_bytes=${dirBytes(partPath, n => dimMonths.exists(m => n.startsWith(s"ship_month=$m/"))) / 1e6}%.1f MB of ${dirBytes(partPath, _ => true) / 1e6}%.1f MB")
for (i <- 1 to 2) timed(s"dpp_off_$i") { dppJoin().collect() }
spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
for (i <- 1 to 2) timed(s"dpp_on_$i") { dppJoin().collect() }
val p = dppJoin().queryExecution.executedPlan.toString
plog.println("dpp_in_plan=" + p.contains("dynamicpruningexpression"))
plog.println("done")
System.exit(0)
