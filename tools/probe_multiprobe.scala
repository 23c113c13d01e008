// S9.13 probe: multi-probe LSH on the clustered fixture (200k vectors,
// 64 Gaussian clusters, sigma 1.0 - same fixture as S9.11) - recall@10
// vs nprobe, against L independent tables at nprobe=1 (the classic
// memory-expensive form: index rows = L x corpus).
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_multiprobe.plog", true), true)
plog.println("=== multiprobe probe (clustered fixture) " + java.time.Instant.now)
import org.apache.spark.sql.functions._
import graft.similarity.{BruteForceKnn, SignLSH, VectorOps}
spark.conf.set("spark.sql.shuffle.partitions", 32)

val n = 200000; val d = 64; val kc = 64
val rnd = new scala.util.Random(42)
val centers: Seq[Seq[Double]] = Seq.fill(kc)(Seq.fill(d)(rnd.nextGaussian()))
val noise = array((0 until d).map(i => randn(1000L + i) * lit(1.0)): _*)
val emb = spark.range(n)
  .select(col("id").cast("long").as("vec_id"), (col("id") % kc).cast("int").as("label"))
  .withColumn("center", element_at(typedlit(centers), col("label") + 1))
  .withColumn("embedding", transform(zip_with(col("center"), noise, (c, z) => c + z), x => x.cast("float")))
  .drop("center")
  .repartition(32).cache()
plog.println(s"fixture n=${emb.count()} d=$d clusters=$kc sigma=1.0")
val queries = emb.filter(col("vec_id") < 50).cache()
queries.count()

def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
  df.select("query_id", "neighbor_id").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

val truth = timed("brute_force") {
  pairsOf(BruteForceKnn.topK(emb, queries, "vec_id", "embedding", 10))
}

val planes1 = SignLSH.planes(dim = 64, bits = 8, tables = 1, seed = 42L).head

for (np <- Seq(1, 2, 4, 8)) {
  val got = timed(s"multiprobe_np$np") {
    pairsOf(SignLSH.multiprobeTopK(emb, queries, "vec_id", "embedding",
      k = 10, nprobe = np, planes1))
  }
  val rec = (got intersect truth).size.toDouble / truth.size
  plog.println(f"multiprobe np=$np recall@10=$rec%.3f")
}

// L independent tables at nprobe=1: candidates = union of own-bucket
// across tables, one ranking. Index rows = L x corpus.
def multiTableTopK(tables: Int): org.apache.spark.sql.DataFrame = {
  val ps = SignLSH.planes(dim = 64, bits = 8, tables = tables, seed = 42L)
  val cands = ps.map { tp =>
    val bucketed = emb.select(col("vec_id"), col("embedding").as("c_emb"),
      SignLSH.bucketOf(VectorOps.asDouble(col("embedding")), tp).as("bucket"))
    val probes = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      SignLSH.bucketOf(VectorOps.asDouble(col("embedding")), tp).as("bucket"))
    bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("q_emb"), col("c_emb"))
  }.reduce(_ unionAll _).dropDuplicates("query_id", "vec_id")
  graft.plans.GraftFunctions.ensureRegistered(spark)
  val w = org.apache.spark.sql.expressions.Window
    .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
  cands.select(col("query_id"), col("vec_id").as("neighbor_id"),
      VectorOps.cosineNative(col("q_emb"), col("c_emb")).as("cos"))
    .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
    .filter(col("rank") <= 10)
}

for (lt <- Seq(2, 4, 8)) {
  val got = timed(s"multitable_L$lt") { pairsOf(multiTableTopK(lt)) }
  val rec = (got intersect truth).size.toDouble / truth.size
  plog.println(f"multitable L=$lt recall@10=$rec%.3f (index rows = L x corpus)")
}

plog.println("done")
plog.close()
System.exit(0)
