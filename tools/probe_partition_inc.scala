// S9.29 input: INCREMENTAL partitioned-layout maintenance at 12M
// lineitem rows (the S9.24 corpus). Round 10's ensurePartitioned
// rewrote the whole layout on any fingerprint change; round 11's
// manifest-committed layout re-clusters only the appended files. This
// measures full build vs a 1-month append: wall time, which partition
// directories gained files, and that every pre-existing data file is
// byte-untouched.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   --driver-memory 24g -i tools/probe_partition_inc.scala
import java.io.{PrintWriter, FileWriter}
import org.apache.spark.sql.functions._
import graft.operators.PartitionedLayout

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_partition_inc.plog", true), true)
plog.println("=== partition incremental probe " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)

val srcPath = "/tmp/ppi_src"
new java.lang.ProcessBuilder("rm", "-rf", srcPath,
  graft.sources.ArtifactStore.root + "/partitioned/ppi_month").start().waitFor()

// 20x sf0.1 lineitem = 12M rows, full width
val base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
val big = base.crossJoin(spark.range(20).toDF("r"))
  .withColumn("l_orderkey", col("l_orderkey") + col("r") * 100000000L)
  .drop("r")
big.repartition(32).write.mode("overwrite").parquet(srcPath)
plog.println(s"rows=${spark.read.parquet(srcPath).count()}")

val derive = (df: org.apache.spark.sql.DataFrame) => df.withColumn(
  "ship_month", (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("int"))

def timed(label: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime
  f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.2f s")
}

def layoutFiles(): Map[String, Long] = {
  val root = java.nio.file.Paths.get(
    graft.sources.ArtifactStore.root + "/partitioned/ppi_month")
  val st = java.nio.file.Files.walk(root)
  try {
    import scala.jdk.CollectionConverters._
    st.iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(f => root.relativize(f).toString ->
        java.nio.file.Files.getLastModifiedTime(f).toMillis).toMap
  } finally st.close()
}

timed("full build (12M rows -> month dirs)")(
  PartitionedLayout.ensureIncremental(spark, srcPath, "ppi_month",
    "ship_month", derive))
val before = layoutFiles()
plog.println(s"layout files after full build: ${before.size}")

// append ~one new month: 100k rows dated 2001-01 (beyond the corpus)
spark.range(100000)
  .select((col("id") + 900000000L).as("l_orderkey"),
    (col("id") % 200000).as("l_partkey"), (col("id") % 100).as("l_suppkey"),
    lit(1).as("l_linenumber"), lit(10.0).as("l_quantity"),
    lit(1000.0).as("l_extendedprice"), lit(0.05).as("l_discount"),
    lit(0.02).as("l_tax"), lit("N").as("l_returnflag"),
    lit("O").as("l_linestatus"),
    (lit("2001-01-01 00:00:00").cast("timestamp")
      + expr("make_interval(0, 0, 0, 0, 0, id % 40000, 0)")).as("l_shipdate"))
  .coalesce(2).write.mode("append").parquet(srcPath)

timed("incremental append (100k rows, one new month)")(
  PartitionedLayout.ensureIncremental(spark, srcPath, "ppi_month",
    "ship_month", derive))
val after = layoutFiles()
val untouched = before.forall { case (f, t) => after.get(f).contains(t) }
val newDirs = after.keySet.diff(before.keySet)
  .map(p => p.split('/').dropRight(1).lastOption.getOrElse(p))
  .toSeq.distinct.sorted
plog.println(s"pre-existing files byte-untouched: $untouched")
plog.println(s"directories that gained files: ${newDirs.mkString(", ")}")
// correctness: layout == flat source
val a = PartitionedLayout.read(spark, "ppi_month").count()
val b2 = spark.read.parquet(srcPath).count()
plog.println(s"layout rows=$a source rows=$b2 equal=${a == b2}")
plog.println("=== done")
System.exit(0)
