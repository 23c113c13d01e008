// S9.31 input: the complete 22-shape TPC-H family at 20x sf0.1
// (12M lineitem / 3M orders / 300k customer / 20k supplier / 400k part
// rows via key-consistent replication) under the DEFAULT
// autoBroadcastJoinThreshold. Catches stats-threshold plan flips the
// sf0.1 bench cannot see, and validates the round-11 de-hinting: with
// no forced broadcast() on SF-growing sides, the planner must still
// pick sane join strategies (zero cartesians) when those sides are
// 20x bigger. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --driver-memory 24g -i tools/probe_tpch_20x.scala
import java.io.{PrintWriter, FileWriter}
import org.apache.spark.sql.functions._

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_tpch20x.plog", true), true)
plog.println("=== tpch 20x probe " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)

val srcDir = "/root/testdata/sf0.1"
val bigDir = "/tmp/tpch20x"
new java.lang.ProcessBuilder("rm", "-rf", bigDir).start().waitFor()
java.nio.file.Files.createDirectories(java.nio.file.Paths.get(bigDir))

// key-consistent 20x replication: each key column is offset by the
// same per-replica stride in EVERY table that carries it, so join
// cardinalities scale linearly and no key collides across replicas
val strides = Map(
  "orderkey" -> 100000000L, "custkey" -> 10000000L,
  "suppkey" -> 10000000L, "partkey" -> 10000000L)

def scale20(table: String, keyCols: Map[String, String]): Unit = {
  val base = spark.read.parquet(s"$srcDir/$table.parquet")
  val out = keyCols.foldLeft(
    base.crossJoin(spark.range(20).toDF("r"))) { case (df, (c, kind)) =>
      df.withColumn(c, col(c) + col("r") * strides(kind))
  }.drop("r")
  out.repartition(32).write.mode("overwrite").parquet(s"$bigDir/$table.parquet")
}
def copy1(table: String): Unit =
  spark.read.parquet(s"$srcDir/$table.parquet")
    .write.mode("overwrite").parquet(s"$bigDir/$table.parquet")

scale20("lineitem", Map("l_orderkey" -> "orderkey",
  "l_partkey" -> "partkey", "l_suppkey" -> "suppkey"))
scale20("orders", Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"))
scale20("customer", Map("c_custkey" -> "custkey"))
scale20("supplier", Map("s_suppkey" -> "suppkey"))
scale20("part", Map("p_partkey" -> "partkey"))
copy1("nation")
copy1("region")
plog.println(s"rows: lineitem=${spark.read.parquet(s"$bigDir/lineitem.parquet").count()} " +
  s"orders=${spark.read.parquet(s"$bigDir/orders.parquet").count()} " +
  s"customer=${spark.read.parquet(s"$bigDir/customer.parquet").count()} " +
  s"supplier=${spark.read.parquet(s"$bigDir/supplier.parquet").count()} " +
  s"part=${spark.read.parquet(s"$bigDir/part.parquet").count()}")

// the SURVEY 8.12 shape map: TPC-H Qn -> registry query
val shapes = Seq(
  "Q1" -> "q1_pricing_summary", "Q2" -> "q62_regional_min_offer",
  "Q3" -> "q67_shipping_priority", "Q4" -> "q29_exists_subquery",
  "Q5" -> "q68_local_supplier_volume", "Q6" -> "q69_forecast_revenue",
  "Q7" -> "q54_nation_volume", "Q8" -> "q70_market_share",
  "Q9" -> "q71_product_profit", "Q10" -> "q61_returned_revenue",
  "Q11" -> "q63_value_share", "Q12" -> "q72_priority_lines",
  "Q13" -> "q60_custdist", "Q14" -> "q73_promo_share",
  "Q15" -> "q53_top_supplier", "Q16" -> "q65_supplier_diversity",
  "Q17" -> "q50_small_qty_revenue", "Q18" -> "q49_big_orders",
  "Q19" -> "q66_disjunctive_promo", "Q20" -> "q64_dominant_supplier",
  "Q21" -> "q48_waiting_supplier", "Q22" -> "q51_dormant_customers")

def joinProfile(plan: String): String = {
  def c(tag: String) = tag + "=" + tag.r.findAllIn(plan).length
  Seq(c("BroadcastHashJoin"), c("SortMergeJoin"), c("ShuffledHashJoin"),
    c("BroadcastNestedLoopJoin"), c("CartesianProduct")).mkString(" ")
}

// one warm sf0.1 pass first (plan baseline), then the 20x pass:
// min-of-2 per shape at 20x so a stray GC does not read as a flip
Seq(("sf0.1", srcDir, 1), ("20x", bigDir, 2)).foreach { case (tag, dir, reps) =>
  plog.println(s"--- $tag pass ($dir)")
  shapes.foreach { case (q, name) =>
    val fn = graft.SparkEntry.queries(name)
    var best = Double.MaxValue
    var prof = ""
    var rows = -1L
    var err: String = null
    (1 to reps).foreach { _ =>
      try {
        val t0 = System.nanoTime
        val df = fn(spark, dir)
        rows = df.count()
        val wall = (System.nanoTime - t0) / 1e9
        if (wall < best) best = wall
        prof = joinProfile(df.queryExecution.executedPlan.toString)
      } catch { case e: Throwable => err = e.toString.take(200) }
    }
    if (err != null) plog.println(s"$q $name ERROR $err")
    else plog.println(f"$q $name wall=$best%.2f s rows=$rows $prof")
  }
}
plog.println("=== done")
plog.close()
System.exit(0)
