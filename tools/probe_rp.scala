// S9.15 probe: JL random-projection prefilter on the S9.11/S9.13
// clustered fixture (200k vectors, 64 Gaussian clusters, sigma 1.0) -
// recall@10 and wall vs reduced dim rd and prefilter budget, against
// brute force and the sign-LSH probe budgets of S9.13.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_rp.plog", true), true)
plog.println("=== rp prefilter probe (clustered fixture) " + java.time.Instant.now)
import org.apache.spark.sql.functions._
import graft.similarity.{BruteForceKnn, RandomProjection, VectorOps}
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

val truth = timed("brute_force_64d") {
  pairsOf(BruteForceKnn.topK(emb, queries, "vec_id", "embedding", 10))
}

for (rd <- Seq(8, 16, 32); pk <- Seq(50, 200)) {
  val ps = RandomProjection.planes(d, rd, seed = 7L)
  val got = timed(s"rp_rd${rd}_pk$pk") {
    pairsOf(RandomProjection.prefilterTopK(
      emb, queries, "vec_id", "embedding", ps, prefilterK = pk, k = 10))
  }
  val rec = (got intersect truth).size.toDouble / truth.size
  plog.println(f"rp rd=$rd pk=$pk recall@10=$rec%.3f")
}
plog.println("probe done")
System.exit(0)
