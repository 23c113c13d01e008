// S9.37 input: WHERE does the near tick's constant live? Per-stage
// wall-ms trace (graft.accept.tickTrace=1) over 12 near batches of
// the scale probe's construction. Run after the fused-signature
// change measured ~0 improvement: attack the measured hotspot, not
// the guessed one. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --driver-memory 16g -i tools/probe_accept_trace.scala
import java.io.{PrintWriter, FileWriter}
import org.apache.spark.sql.functions._

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_accept_trace.plog", true), true)
plog.println("=== accept near-tick stage trace " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)
System.setProperty("graft.accept.tickTrace", "1")

val outN = "/tmp/accept_trace_near"
new java.lang.ProcessBuilder("rm", "-rf", outN).start().waitFor()
val nB = 12
val perB = 3000
val newPer = perB * 4 / 5

def dupsFrom(b: Int) = {
  val n = perB - newPer
  graft.streaming.StreamingAcceptIngest.accepted(spark, outN)
    .select(col("text"), col("fp"))
    .orderBy(pmod(hash(col("fp"), lit(b)), lit(1000000)), col("fp"))
    .limit(n)
    .withColumn("text", concat(col("text"), lit(" zz"), lit(b)))
    .withColumn("doc_id", monotonically_increasing_id()
      + b.toLong * perB + 700000000L)
    .select("doc_id", "text")
}

for (b <- 0 until nB) {
  val gid = col("id") + b.toLong * newPer
  val fresh = spark.range(newPer).select(
    (gid + 2000000L).as("doc_id"),
    concat_ws(" ", (0 until 20).map(i =>
      lower(hex(xxhash64(concat(gid.cast("string"),
        lit(s"_$i")))))): _*)
      .as("text"))
  val df = (if (b == 0) fresh
    else fresh.unionByName(dupsFrom(b))).localCheckpoint()
  val t0 = System.nanoTime
  graft.streaming.StreamingAcceptIngest.applyBatchNear(
    df, b.toLong, "doc_id", "text", outN, threshold = 0.7,
    expectedItems = 1000000L)
  val wall = (System.nanoTime - t0) / 1e9
  if (b >= 1) {
    val st = graft.streaming.StreamingAcceptIngest.AcceptStats
      .snapshot.values.headOption.getOrElse(Map.empty)
    val stages = st.toSeq.filter(_._1.startsWith("last_ms_"))
      .sortBy(-_._2)
      .map { case (k, v) => s"${k.stripPrefix("last_ms_")}=${v}ms" }
      .mkString(" ")
    plog.println(f"batch $b wall=$wall%.2f s | $stages")
  }
}
plog.println("=== done")
plog.close()
System.exit(0)
