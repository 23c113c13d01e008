// S9.33 input: CoOccurStore advance cost at 1M (group,item) rows --
// the claim is O(increment + affected groups' rows), never O(corpus).
// Build a 1M-row basket corpus (100k groups x ~10 items), then append
// a 10k-row batch touching 1k groups and measure the advance serve vs
// a forced full rebuild of the same final corpus. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --driver-memory 16g -i tools/probe_cooc.scala
import java.io.{PrintWriter, FileWriter}
import org.apache.spark.sql.functions._

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_cooc.plog", true), true)
plog.println("=== cooc probe " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)

val dir = "/tmp/cooc_probe"
new java.lang.ProcessBuilder("rm", "-rf", dir).start().waitFor()
java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
// also clear this corpus's artifacts from a prior probe run
new java.lang.ProcessBuilder("bash", "-c",
  "rm -rf /root/repo/target/graft_index/_tmp_cooc_probe*").start().waitFor()

// 1M rows: group g holds items drawn from a 50k-item space with
// zipf-ish reuse so real co-occurrence structure exists
val base = spark.range(100000).select(col("id").as("g"))
  .crossJoin(spark.range(10).select(col("id").as("k")))
  .select(col("g"), pmod(hash(col("g") * 13 + col("k")), lit(50000)).cast("long").as("i"))
base.repartition(16).write.mode("overwrite").parquet(s"$dir/baskets.parquet")

def timed[T](what: String)(body: => T): T = {
  val t0 = System.nanoTime
  val r = body
  plog.println(f"$what: ${(System.nanoTime - t0) / 1e9}%.2f s")
  r
}

timed("full build (1M rows, 100k groups)") {
  graft.operators.CoOccurStore.edges(spark, dir, "baskets", "g", "i", 2L).count()
}
timed("warm serve (no change)") {
  graft.operators.CoOccurStore.edges(spark, dir, "baskets", "g", "i", 2L).count()
}

// append 10k rows into 1k existing groups (so pre-increment rows of
// those groups must be re-read -- the affected-group path, cross-gen
// pairs included)
spark.range(10000)
  .select(pmod(col("id"), lit(1000)).cast("long").as("g"),
    pmod(hash(col("id") * 7), lit(50000)).cast("long").as("i"))
  .coalesce(2).write.mode("append").parquet(s"$dir/baskets.parquet")

val n1 = timed("ADVANCE serve after 10k-row append over 1k groups") {
  graft.operators.CoOccurStore.edges(spark, dir, "baskets", "g", "i", 2L).count()
}

// the honest comparator: the same final corpus, computed from scratch
val n2 = timed("forced from-scratch pairCounts over the final corpus") {
  val gi = spark.read.parquet(s"$dir/baskets.parquet")
    .select(col("g"), col("i")).distinct()
  graft.dedup.PairGen.pairsWithin(gi, Seq("g"), col("i"))
    .groupBy("a", "b").agg(count(lit(1)).as("n"))
    .where(col("n") >= 2).count()
}
plog.println(s"stored=$n1 direct=$n2 equal=${n1 == n2}")
plog.println("=== done")
plog.close()
System.exit(0)
