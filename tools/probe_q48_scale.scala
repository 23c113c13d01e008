// S9.26 addendum: the Q21-shape semi/anti stack at 20x (12M lineitem
// rows, 300k F-orders) - does the three-legged fact plan hold when the
// fact grows? Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   --driver-memory 24g -i tools/probe_q48_scale.scala
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_q48_scale.plog", true), true)
plog.println("=== q48 scale probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)

// consistent 20x replication: orderkeys offset identically in both
// tables so join cardinalities scale linearly
val liBase = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
val ordBase = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
val sup = spark.read.parquet("/root/testdata/sf0.1/supplier.parquet")
val li = liBase.crossJoin(spark.range(20).toDF("r"))
  .withColumn("l_orderkey", col("l_orderkey") + col("r") * 100000000L)
  .drop("r").repartition(32).localCheckpoint()
val ord = ordBase.crossJoin(spark.range(20).toDF("r"))
  .withColumn("o_orderkey", col("o_orderkey") + col("r") * 100000000L)
  .drop("r").repartition(32).localCheckpoint()
plog.println(s"lineitem=${li.count()} orders=${ord.count()}")

def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
def q48() = {
  val l1 = li
    .join(ord.where(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate"),
      col("l_orderkey") === col("o_orderkey"))
    .where(late)
    .select("l_orderkey", "l_suppkey", "o_orderdate")
  val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
  val l3 = li.select(col("l_orderkey").as("k3"),
    col("l_suppkey").as("s3"), col("l_shipdate").as("d3"))
  l1.join(l2, col("l_orderkey") === col("k2") &&
      col("l_suppkey") =!= col("s2"), "left_semi")
    .join(l3, col("l_orderkey") === col("k3") &&
      col("l_suppkey") =!= col("s3") &&
      col("d3") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
      "left_anti")
    .join(broadcast(sup.select("s_suppkey", "s_name")),
      col("l_suppkey") === col("s_suppkey"))
    .groupBy("s_name").agg(count(lit(1)).as("numwait"))
    .orderBy(col("numwait").desc, col("s_name")).limit(100)
}
for (i <- 1 to 2) timed(s"q48_20x_$i") { plog.println("rows=" + q48().count()) }
val p = q48().queryExecution.executedPlan.toString
plog.println("semi=" + p.contains("LeftSemi") + " anti=" + p.contains("LeftAnti") +
  " cartesian=" + p.contains("CartesianProduct"))
plog.println("done")
System.exit(0)
