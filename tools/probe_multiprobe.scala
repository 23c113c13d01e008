// S9.13 probe: multi-probe LSH at 400k vectors - recall@10 vs nprobe,
// and the memory claim: one table at nprobe=L vs L tables at nprobe=1.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_multiprobe.plog", true), true)
plog.println("=== multiprobe probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
import graft.similarity.{BruteForceKnn, SignLSH, VectorOps}
spark.conf.set("spark.sql.shuffle.partitions", 32)

// 200x replication of sf0.1 embeddings (2k vecs) = 400k, distinct ids,
// deterministic per-replica perturbation
val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
val reps = 200
val corpus = "/root/repo/target/probe_mp_embeddings.parquet"
val big = base.crossJoin(spark.range(reps).toDF("r"))
  .select((col("vec_id") + col("r") * 10000000L).as("vec_id"),
    transform(col("embedding"),
      (x, i) => x + (pmod(col("vec_id") * 31 + col("r") * 7 + i, lit(11)).cast("float") - 5.0f) / 1000.0f)
      .as("embedding"))
big.repartition(32).write.mode("overwrite").parquet(corpus)
val emb = spark.read.parquet(corpus)
plog.println(s"corpus_vecs=${emb.count()}")

val queries = emb.filter(col("vec_id") < 50)
plog.println(s"queries=${queries.count()}")

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

// L independent tables at nprobe=1 (the memory-expensive classic):
// candidates = union of own-bucket across tables, one ranking.
def multiTableTopK(tables: Int): org.apache.spark.sql.DataFrame = {
  val ps = SignLSH.planes(dim = 64, bits = 8, tables = tables, seed = 42L)
  val cands = ps.zipWithIndex.map { case (tp, _) =>
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
    .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
  cands.select(col("query_id"), col("vec_id").as("neighbor_id"),
      VectorOps.cosineNative(col("q_emb"), col("c_emb")).as("cos"))
    .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
}

for (lt <- Seq(4, 8)) {
  val got = timed(s"multitable_L$lt") { pairsOf(multiTableTopK(lt)) }
  val rec = (got intersect truth).size.toDouble / truth.size
  plog.println(f"multitable L=$lt recall@10=$rec%.3f (index rows = L x corpus)")
}

plog.println("done")
plog.close()
System.exit(0)
