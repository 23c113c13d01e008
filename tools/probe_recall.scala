import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_recall.plog", true), true)
plog.println("=== IVF recall probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").repartition(32).cache()
plog.println("n=" + emb.count() + " dim=" + emb.selectExpr("size(embedding)").first.getInt(0))
val queries = emb.filter(col("vec_id") < 50).cache()
plog.println("queries=" + queries.count())
val t0 = System.nanoTime()
val truth = graft.similarity.BruteForceKnn.topKAgg(emb, queries, "vec_id", "embedding", 10).select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
plog.println(f"brute_force_wall=${(System.nanoTime()-t0)/1e9}%.2f s truth_pairs=${truth.size}")
val tTrain = System.nanoTime()
val codebook = graft.similarity.IvfKnn.trainCodebook(emb, "vec_id", "embedding", 16, 2)
val cb = graft.similarity.IvfKnn.collectCodebook(codebook, "cell")
val assigned = graft.similarity.IvfKnn.assignCells(emb, "embedding", cb).cache()
plog.println(f"train_wall=${(System.nanoTime()-tTrain)/1e9}%.2f s cells=${cb.size}")
val qAssigned = graft.similarity.IvfKnn.assignCells(queries, "embedding", cb)
for (nprobe <- Seq(1, 2, 4, 8, 16)) { val t1 = System.nanoTime(); val got = graft.similarity.IvfKnn.topK(assigned, qAssigned, "vec_id", "_cell", "embedding", 10, nprobe).select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet; val wall = (System.nanoTime()-t1)/1e9; plog.println(f"nprobe=$nprobe%2d wall=$wall%.2f s recall@10=${(got intersect truth).size.toDouble / truth.size}%.4f pairs=${got.size}") }
val nLabels = emb.select("label").distinct.count()
plog.println(s"label_cells=$nLabels")
for (nprobe <- Seq(1, 2, 4)) { val t1 = System.nanoTime(); val got = graft.similarity.IvfKnn.topK(emb, queries, "vec_id", "label", "embedding", 10, nprobe).select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet; val wall = (System.nanoTime()-t1)/1e9; plog.println(f"label nprobe=$nprobe%2d wall=$wall%.2f s recall@10=${(got intersect truth).size.toDouble / truth.size}%.4f") }
plog.println("=== done")
plog.close()
System.exit(0)
