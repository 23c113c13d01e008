// S9.33 input: the iterative graph family (BFS shortest path, k-core
// peel, plus the existing PageRank/triangles for context) at 20x
// sf0.1 -- 12M lineitem / 400k part rows via the same key-consistent
// replication as probe_tpch_20x. The iterative loops are the scale
// question here, not join strategy: per-round work must track the
// SURVIVING frontier/edge set, and driver-side round count must stay
// bounded (BFS maxHops, k-core fixpoint). Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --driver-memory 24g -i tools/probe_graph_20x.scala
import java.io.{PrintWriter, FileWriter}
import org.apache.spark.sql.functions._

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_graph20x.plog", true), true)
plog.println("=== graph 20x probe " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)

val srcDir = "/root/testdata/sf0.1"
val bigDir = "/tmp/graph20x"
new java.lang.ProcessBuilder("rm", "-rf", bigDir).start().waitFor()
java.nio.file.Files.createDirectories(java.nio.file.Paths.get(bigDir))

// key-consistent 20x replication (same strides as probe_tpch_20x):
// the co-purchase graph becomes 20 disjoint isomorphic copies -- the
// stride is a multiple of 500, so each replica carries its own 4 BFS
// seeds and its own k-core; rounds stay constant while per-round work
// scales 20x, which is exactly the scaling the loops must absorb.
val strides = Map("orderkey" -> 100000000L, "partkey" -> 10000000L,
  "suppkey" -> 10000000L, "custkey" -> 10000000L)
def scale20(table: String, keyCols: Map[String, String]): Unit = {
  val base = spark.read.parquet(s"$srcDir/$table.parquet")
  val out = keyCols.foldLeft(
    base.crossJoin(spark.range(20).toDF("r"))) { case (df, (c, kind)) =>
      df.withColumn(c, col(c) + col("r") * strides(kind))
  }.drop("r")
  out.repartition(32).write.mode("overwrite").parquet(s"$bigDir/$table.parquet")
}
scale20("lineitem", Map("l_orderkey" -> "orderkey",
  "l_partkey" -> "partkey", "l_suppkey" -> "suppkey"))
scale20("part", Map("p_partkey" -> "partkey"))
scale20("orders", Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"))
plog.println(s"rows: lineitem=${spark.read.parquet(s"$bigDir/lineitem.parquet").count()} " +
  s"part=${spark.read.parquet(s"$bigDir/part.parquet").count()}")

val shapes =
  Seq("q74_shortest_path", "q75_kcore", "q76_label_propagation",
    "q77_weighted_sssp", "q43_pagerank",
    // round 14: the two new graph operators. q78's wedge volume is
    // Sum d_v^2 over shared-neighbor mediators -- the 20x run is what
    // decides whether the registered query needs the degreeCap knob
    // (key-consistent replication: 20 disjoint isomorphic copies, so
    // per-replica degrees are UNCHANGED and volume scales linearly;
    // the hub-degree growth regime is probed separately below).
    "q78_link_prediction", "q79_clustering_coefficient")
Seq(("sf0.1", srcDir, 1), ("20x", bigDir, 2)).foreach { case (tag, dir, reps) =>
  plog.println(s"--- $tag pass ($dir)")
  shapes.foreach { name =>
    val fn = graft.SparkEntry.queries(name)
    var best = Double.MaxValue
    var rows = -1L
    var err: String = null
    (1 to reps).foreach { _ =>
      try {
        val t0 = System.nanoTime
        rows = fn(spark, dir).count()
        val wall = (System.nanoTime - t0) / 1e9
        if (wall < best) best = wall
      } catch { case e: Throwable => err = e.toString.take(200) }
    }
    if (err != null) plog.println(s"$name ERROR $err")
    else plog.println(f"$name wall=$best%.2f s rows=$rows")
  }
}

// q78/q80 OUTPUT-PATH variants with rows > 0 at BOTH scales: the
// registered q78 (minCommon=2) predicts NOTHING on this corpus
// (rows=0 above), so its flat walls evidence the wedge-join cost but
// never exercise the aggregate/anti-join/output path at scale. The
// minCommon=1 variant runs the identical plan with a nonempty result
// (disjoint 20x copies => rows must scale exactly 20x); the capped
// variant exercises q80's mediator-cap algebra the same way.
Seq(("sf0.1", srcDir, 1), ("20x", bigDir, 2)).foreach { case (tag, dir, reps) =>
  Seq(("q78var_minCommon1", None: Option[Long]),
      ("q80var_cap8_minCommon1", Some(8L): Option[Long])).foreach {
    case (name, cap) =>
      var best = Double.MaxValue
      var rows = -1L
      (1 to reps).foreach { _ =>
        val edges = graft.operators.CoOccurStore.edges(spark, dir,
          "lineitem", "l_orderkey", "l_partkey", 2L).localCheckpoint()
        val t0 = System.nanoTime
        rows = graft.operators.LinkPrediction
          .commonNeighbors(edges, minCommon = 1L, degreeCap = cap).count()
        val wall = (System.nanoTime - t0) / 1e9
        if (wall < best) best = wall
      }
      plog.println(f"$tag $name wall=$best%.2f s rows=$rows")
  }
}
plog.println("=== done")
plog.close()
System.exit(0)
