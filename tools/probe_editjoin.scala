// S9.18 probe: exact edit-distance join at 1M DISTINCT strings - the
// honest fixture the synthetic tables can't provide (64 distinct part
// names; Customer# shares a literal prefix). Random 12-char strings +
// 5% planted distance-1/2 typo neighbors, k=2. ASCII only.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_editjoin.plog", true), true)
plog.println("=== editjoin probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)
def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

val n = 1000000L
val base = spark.range(n).select(col("id").as("sid"),
  substring(md5(col("id").cast("string")), 1, 12).as("s"))
// planted neighbors: for 5% of ids, one char substituted (dist 1) and
// one char dropped (dist 1, shorter) - both inside k=2
val typoSub = spark.range(0L, 50000L).select((col("id") + 10000000L).as("sid"),
  concat(substring(md5(col("id").cast("string")), 1, 5), lit("z"),
    substring(md5(col("id").cast("string")), 7, 6)).as("s"))
val typoDel = spark.range(0L, 50000L).select((col("id") + 20000000L).as("sid"),
  concat(substring(md5(col("id").cast("string")), 1, 5),
    substring(md5(col("id").cast("string")), 7, 6)).as("s"))
val strs = base.unionByName(typoSub).unionByName(typoDel)
  .repartition(64).localCheckpoint()
plog.println(s"strings=${strs.count()} distinct=${strs.select("s").distinct().count()}")

val pairs = timed("edit_join_1p1M_k2") {
  graft.dedup.EditJoin.similarPairs(strs, "sid", col("s"), k = 2).count()
}
plog.println(s"pairs_k2=$pairs (>=100k planted expected: sub+del per base, sub-del cross pairs at dist 2)")
plog.println("done")
