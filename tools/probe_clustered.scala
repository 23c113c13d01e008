// S9 probe: clustered-embedding fixture (mixture of Gaussians) - the
// S9.7 nprobe/recall curve and the S9.10 PQ ceiling re-measured on
// vectors with real cluster structure, plus the residual-vs-plain
// IVFPQ ceiling (v17) on both this fixture and the sf0.1 distinct
// corpus. Run via spark-shell -i (see .claude/skills/verify).
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_clustered.plog", true), true)
plog.println("=== clustered fixture probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
import graft.similarity._
spark.conf.set("spark.sql.shuffle.partitions", 32)

// ---- fixture: 200k vectors in R^64, 64 Gaussian clusters, sigma 0.35
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

val t0 = System.nanoTime()
val truth = BruteForceKnn.topKAgg(emb, queries, "vec_id", "embedding", 10)
  .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
plog.println(f"brute_force_wall=${(System.nanoTime()-t0)/1e9}%.1f s truth=${truth.size}")

// ---- S9.7 re-run: trained cells vs (true-)label cells on clustered data
val tTrain = System.nanoTime()
val codebook = IvfKnn.trainCodebook(emb, "vec_id", "embedding", kc, 2)
val cb = IvfKnn.collectCodebook(codebook, "cell")
val assigned = IvfKnn.assignCells(emb, "embedding", cb).cache()
assigned.count()
plog.println(f"train_wall=${(System.nanoTime()-tTrain)/1e9}%.1f s cells=${cb.size}")
for (nprobe <- Seq(1, 2, 4, 8, 16)) {
  val t1 = System.nanoTime()
  val got = IvfKnn.topK(assigned, IvfKnn.assignCells(queries, "embedding", cb),
      "vec_id", "_cell", "embedding", 10, nprobe)
    .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  plog.println(f"trained nprobe=$nprobe%2d wall=${(System.nanoTime()-t1)/1e9}%.1f s recall@10=${(got intersect truth).size.toDouble / truth.size}%.4f")
}
for (nprobe <- Seq(1, 2, 4)) {
  val t1 = System.nanoTime()
  val got = IvfKnn.topK(emb, queries, "vec_id", "label", "embedding", 10, nprobe)
    .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  plog.println(f"label   nprobe=$nprobe%2d wall=${(System.nanoTime()-t1)/1e9}%.1f s recall@10=${(got intersect truth).size.toDouble / truth.size}%.4f")
}

// ---- S9.10 re-run on the fixture: PQ ceiling, plain vs residual
val books = ProductQuantizer.train(emb, "vec_id", "embedding", 4, d / 4, 256, 1)
val codes = ProductQuantizer.encoded(assigned, "embedding", d / 4, books)
  .select(col("vec_id") +: col("_cell") +: (0 until 4).map(s => col(s"pq_$s")): _*).cache()
codes.count()
locally {
  val t1 = System.nanoTime()
  val got = ProductQuantizer.ivfAdcTopK(emb, queries, "vec_id", "embedding", d / 4,
      books, codes, "_cell", codebook, 10, 200, kc)
    .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  plog.println(f"pq_plain ceiling (nprobe=all) wall=${(System.nanoTime()-t1)/1e9}%.1f s recall@10=${(got intersect truth).size.toDouble / truth.size}%.4f")
}
val resBooks = ProductQuantizer.train(
  ProductQuantizer.withResidual(assigned, "embedding", "_cell", codebook, "_res"),
  "vec_id", "_res", 4, d / 4, 256, 1)
val resCodes = ProductQuantizer.encoded(
    ProductQuantizer.withResidual(assigned, "embedding", "_cell", codebook, "_res"),
    "_res", d / 4, resBooks)
  .select(col("vec_id") +: col("_cell") +: (0 until 4).map(s => col(s"pq_$s")): _*).cache()
resCodes.count()
locally {
  val t1 = System.nanoTime()
  val got = ProductQuantizer.ivfAdcTopKResidual(emb, queries, "vec_id", "embedding", d / 4,
      resBooks, resCodes, "_cell", codebook, 10, 200, kc)
    .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  plog.println(f"pq_residual ceiling (nprobe=all) wall=${(System.nanoTime()-t1)/1e9}%.1f s recall@10=${(got intersect truth).size.toDouble / truth.size}%.4f")
}
// gated points for both forms
for (nprobe <- Seq(4, 8, 16)) {
  val g1 = ProductQuantizer.ivfAdcTopK(emb, queries, "vec_id", "embedding", d / 4,
      books, codes, "_cell", codebook, 10, 200, nprobe)
    .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  val g2 = ProductQuantizer.ivfAdcTopKResidual(emb, queries, "vec_id", "embedding", d / 4,
      resBooks, resCodes, "_cell", codebook, 10, 200, nprobe)
    .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  plog.println(f"gated nprobe=$nprobe%2d/$kc plain=${(g1 intersect truth).size.toDouble / truth.size}%.4f residual=${(g2 intersect truth).size.toDouble / truth.size}%.4f")
}

// ---- sf0.1 distinct corpus: the direct S9.10 ceiling comparison
val e01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").repartition(32).cache()
val d01 = e01.selectExpr("size(embedding)").first.getInt(0)
val q01 = e01.filter(col("vec_id") < 50).cache()
val truth01 = BruteForceKnn.topKAgg(e01, q01, "vec_id", "embedding", 10)
  .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
val cb01df = IvfKnn.trainCodebook(e01, "vec_id", "embedding", 16, 2)
val cb01 = IvfKnn.collectCodebook(cb01df, "cell")
val as01 = IvfKnn.assignCells(e01, "embedding", cb01).cache()
val books01 = ProductQuantizer.train(e01, "vec_id", "embedding", 4, d01 / 4, 256, 1)
val codes01 = ProductQuantizer.encoded(as01, "embedding", d01 / 4, books01)
  .select(col("vec_id") +: col("_cell") +: (0 until 4).map(s => col(s"pq_$s")): _*)
val gotP = ProductQuantizer.ivfAdcTopK(e01, q01, "vec_id", "embedding", d01 / 4,
    books01, codes01, "_cell", cb01df, 10, 200, 16)
  .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
val resBooks01 = ProductQuantizer.train(
  ProductQuantizer.withResidual(as01, "embedding", "_cell", cb01df, "_res"),
  "vec_id", "_res", 4, d01 / 4, 256, 1)
val resCodes01 = ProductQuantizer.encoded(
    ProductQuantizer.withResidual(as01, "embedding", "_cell", cb01df, "_res"),
    "_res", d01 / 4, resBooks01)
  .select(col("vec_id") +: col("_cell") +: (0 until 4).map(s => col(s"pq_$s")): _*)
val gotR = ProductQuantizer.ivfAdcTopKResidual(e01, q01, "vec_id", "embedding", d01 / 4,
    resBooks01, resCodes01, "_cell", cb01df, 10, 200, 16)
  .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
plog.println(f"sf0.1 ceiling plain=${(gotP intersect truth01).size.toDouble / truth01.size}%.4f residual=${(gotR intersect truth01).size.toDouble / truth01.size}%.4f")
plog.println("=== done")
plog.close()
System.exit(0)
