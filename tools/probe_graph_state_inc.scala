// S9.34 input: the stored graph-state family's ADVANCE cost on a
// localized edge append at 20x scale -- the verdict-6 done criterion.
// The coreness/community pieces must advance O(affected subgraph) on
// a small append (driver-side expansion + protected peel / ball
// recompute under the caps), not O(corpus) and not O(artifact); the
// comparison points are the from-scratch build of the same artifact
// and the pre-store per-query iterative cost. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --driver-memory 24g -i tools/probe_graph_state_inc.scala
// (expects /tmp/graph20x from probe_graph_20x.scala; rebuilds it if
// absent)
import java.io.{PrintWriter, FileWriter}
import org.apache.spark.sql.functions._

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_graph_state_inc.plog", true), true)
plog.println("=== graph-state incremental probe " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)

val srcDir = "/root/testdata/sf0.1"
val bigDir = "/tmp/graph20x"
if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$bigDir/lineitem.parquet"))) {
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(bigDir))
  val strides = Map("orderkey" -> 100000000L, "partkey" -> 10000000L,
    "suppkey" -> 10000000L)
  val base = spark.read.parquet(s"$srcDir/lineitem.parquet")
  base.crossJoin(spark.range(20).toDF("r"))
    .withColumn("l_orderkey", col("l_orderkey") + col("r") * strides("orderkey"))
    .withColumn("l_partkey", col("l_partkey") + col("r") * strides("partkey"))
    .withColumn("l_suppkey", col("l_suppkey") + col("r") * strides("suppkey"))
    .drop("r")
    .repartition(32).write.mode("overwrite").parquet(s"$bigDir/lineitem.parquet")
}
val nRows = spark.read.parquet(s"$bigDir/lineitem.parquet").count()
plog.println(s"corpus rows=$nRows")

def timed[T](tag: String)(body: => T): T = {
  val t0 = System.nanoTime
  val r = body
  plog.println(f"$tag wall=${(System.nanoTime - t0) / 1e9}%.2f s")
  r
}

// cold: full artifact build (gi + pairparts + kcore fixpoint + LPA)
val coldRows = timed("cold build+serve coreness") {
  graft.operators.CoOccurStore
    .coreness(spark, bigDir, "lineitem", "l_orderkey", "l_partkey").count()
}
plog.println(s"core members=$coldRows")
timed("warm serve coreness") {
  graft.operators.CoOccurStore
    .coreness(spark, bigDir, "lineitem", "l_orderkey", "l_partkey").count()
}
timed("warm serve communities") {
  graft.operators.CoOccurStore
    .communities(spark, bigDir, "lineitem", "l_orderkey", "l_partkey").count()
}

// localized append: 3 NEW orders over existing parts of one replica
// (the affected subgraph is a handful of baskets; new edges cross the
// cut inside it). The advance must be corpus-size-insensitive.
def appendBatch(orderBase: Long): Unit = {
  val parts = spark.read.parquet(s"$srcDir/part.parquet")
    .select("p_partkey").limit(6).collect().map(_.getLong(0))
  val rows = for (o <- 0L to 2L; p <- parts.take(4 + o.toInt))
    yield (orderBase + o, p)
  val schema = spark.read.parquet(s"$bigDir/lineitem.parquet").schema
  import spark.implicits._
  val df0 = rows.toDF("l_orderkey", "l_partkey")
  val full = schema.fields.foldLeft(df0) { (df, f) =>
    if (df.columns.contains(f.name)) df
    else df.withColumn(f.name, lit(null).cast(f.dataType))
  }.select(schema.fieldNames.map(col): _*)
  full.coalesce(1).write.mode("append").parquet(s"$bigDir/lineitem.parquet")
}

appendBatch(77700000001L)
timed("advance+serve coreness after localized append") {
  graft.operators.CoOccurStore
    .coreness(spark, bigDir, "lineitem", "l_orderkey", "l_partkey").count()
}
timed("serve communities after same append (state already caught up)") {
  graft.operators.CoOccurStore
    .communities(spark, bigDir, "lineitem", "l_orderkey", "l_partkey").count()
}
appendBatch(77700000101L)
timed("advance+serve communities after second localized append") {
  graft.operators.CoOccurStore
    .communities(spark, bigDir, "lineitem", "l_orderkey", "l_partkey").count()
}
// advance-side memory gauge (round-14 verdict item 4): the pinned
// cut-edge frame is O(cut edges) of executor storage per advance --
// record its size so the 100-TB regime decision is a number, not a
// guess (class doc names the steady-state alternative).
plog.println("advance stats: " +
  graft.operators.CoOccurStore.AdvanceStats.snapshot)
plog.println("=== done")
plog.close()
System.exit(0)
