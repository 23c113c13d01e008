// S9.29 input: adaptive-width stored CMS at 1M docs / 50k vocab - the
// S9.21 corpus where fixed width-512 drowned in collision mass (~78k
// mass per cell). cmsAdaptive sizes width from the stored exact
// vocabulary (next pow2 of 4x|vocab|); this measures point-estimate
// error for both widths against exact counts, vs the CMS theory bound
// eps*N ~ (e/width)*N.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   --driver-memory 24g -i tools/probe_cms_adaptive.scala
import java.io.{PrintWriter, FileWriter}
import org.apache.spark.sql.functions._
import graft.sketch.{CountMin, SketchStore}

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_cms_adaptive.plog", true), true)
plog.println("=== cms adaptive probe " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)

val sf = "/tmp/probe_cms_sf"
new java.lang.ProcessBuilder("rm", "-rf", sf).start().waitFor()
// also clear prior artifacts for this corpus
for (k <- Seq("_sk1", "_tfidf1024", "_cmsw")) {
  val pk = graft.sources.ArtifactStore.pathKey(s"$sf/documents.parquet")
  val root = java.nio.file.Paths.get(graft.sources.ArtifactStore.root)
  if (java.nio.file.Files.exists(root)) {
    val st = java.nio.file.Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.filter(_.getFileName.toString.startsWith(pk))
        .foreach { d =>
          val w = java.nio.file.Files.walk(d)
          try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => java.nio.file.Files.delete(f))
          finally w.close()
        }
    } finally st.close()
  }
}

// zipf-ish 50k vocab: token index ~ floor(50k * u^3) skews mass low
val docs = spark.range(1000000L)
  .select(col("id").as("doc_id"), lit("en").as("lang"),
    lit("s1").as("source"),
    concat_ws(" ", (0 until 30).map(i =>
      concat(lit("w"), floor(lit(50000) *
        pow(pmod(hash(col("id") * 31 + i), lit(100000)).cast("double") / 100000.0, 3)))): _*)
      .as("text"))
docs.repartition(8).write.parquet(s"$sf/documents.parquet")

def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime
  val r = f
  plog.println(f"$label: ${(System.nanoTime - t0) / 1e9}%.1f s")
  r
}

val (skA, wA) = timed("adaptive sketch build")(SketchStore.cmsAdaptive(spark, sf, "documents"))
plog.println(s"adaptive width=$wA (fixed demo width=${SketchStore.Width})")
val skF = timed("fixed-width sketch build")(SketchStore.cms(spark, sf, "documents"))

// exact counts for 20 probes across the frequency spectrum
import graft.functions.TextFunctions
val tc = docs.select(explode(TextFunctions.tokens(
    TextFunctions.normalize(col("text")))).as("term"))
  .groupBy("term").agg(count(lit(1)).as("exact"))
  .localCheckpoint()
val probes = tc.orderBy(col("exact").desc).limit(5).select("term")
  .unionByName(tc.where(col("exact").between(100, 1000)).limit(10).select("term"))
  .unionByName(tc.orderBy(col("exact").asc).limit(5).select("term"))
  .localCheckpoint()
val n = tc.agg(sum("exact")).head.getLong(0)
plog.println(s"stream N=$n vocab=${tc.count()}")

def err(sk: org.apache.spark.sql.DataFrame, w: Int, label: String): Unit = {
  val est = CountMin.estimate(sk, probes, "term", SketchStore.Depth, w)
  val joined = est.join(tc, "term")
    .select(col("term"), col("cms_count"), col("exact"),
      (col("cms_count") - col("exact")).as("over"))
    .orderBy(col("exact").desc)
  val rows = joined.collect()
  val maxOver = rows.map(_.getAs[Long]("over")).max
  val meanOver = rows.map(_.getAs[Long]("over")).sum.toDouble / rows.length
  plog.println(f"$label: maxOver=$maxOver meanOver=$meanOver%.0f theoryBound(e*N/w)=${math.E * n / w}%.0f")
  rows.take(6).foreach(r => plog.println(
    s"  ${r.getString(0)} exact=${r.getAs[Long]("exact")} est=${r.getAs[Long]("cms_count")}"))
}
err(skF, SketchStore.Width, s"fixed width ${SketchStore.Width}")
err(skA, wA, s"adaptive width $wA")
plog.println("=== done")
System.exit(0)
