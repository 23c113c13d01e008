// S9.16 probe: d23 exact prefix-filter join + t27/v22 hashed TF-IDF
// at 1 M docs. Fixture: Zipf-1 vocabulary (token rank = floor(V^u),
// log-uniform - the real-text df shape prefix filtering exploits),
// 40 tokens/doc, 10 k planted near-dup pairs (one token changed,
// J ~ 39/41 >= 0.9). Measures candidate volume (the prefix filter's
// whole point), the hot-bucket bound, wall, and contrasts with the
// degenerate 31-token sf0.1 corpus (where NO token-blocking scheme
// can discriminate - measured numbers in SURVEY S9.16).
// Run via spark-shell -i (see .claude/skills/verify).
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_prefix.plog", true), true)
plog.println("=== prefix join + tfidf probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
spark.conf.set("spark.sql.shuffle.partitions", 32)

val V = 100000.0; val L = 40; val n = 990000L; val dups = 10000L
val baseText = concat_ws(" ",
  (0 until L).map(i => concat(lit("w"),
    floor(pow(lit(V), rand(4200L + i))).cast("long"))): _*)
val uniq = spark.range(n).select(col("id").as("doc_id"), baseText.as("text"))
// planted near-dups: copy of doc i with the last token replaced
val nd = uniq.where(col("doc_id") < dups)
  .select((col("doc_id") + 10000000L).as("doc_id"),
    concat(substring_index(col("text"), " ", L - 1),
      lit(" zz"), col("doc_id")).as("text"))
val docs = uniq.unionByName(nd).repartition(64).localCheckpoint()
plog.println(s"corpus_docs=${docs.count()} (planted_neardups=$dups)")

def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

// --- candidate stats: the operator's own chain up to the distinct
// (re-stated here for measurement; contraction is a no-op on this
// all-distinct fixture so docs stand in for reps)
val (tauNum, tauDen) = (9, 10)
val sets = docs.select(col("doc_id"),
  array_distinct(split(TextFunctions.normalize(col("text")), " ")).as("toks"))
val exploded = sets.select(col("doc_id"), explode(col("toks")).as("tok"))
val dfreq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
plog.println(s"vocab=${dfreq.count()}")
val keyed = exploded.join(dfreq, "tok")
  .select(col("doc_id"), concat(lpad(col("df").cast("string"), 10, "0"),
    lit("|"), col("tok")).as("k"))
val ordered = keyed.groupBy("doc_id")
  .agg(sort_array(collect_list(col("k"))).as("ks"))
  .select(col("doc_id"), col("ks"), size(col("ks")).as("sz"))
val prefLen = (col("sz") - floor((col("sz") * tauNum + (tauDen - 1))
  / tauDen) + 1).cast("int")
val pref = ordered.select(col("doc_id"), col("sz"),
  explode(slice(col("ks"), lit(1), prefLen)).as("k"))
timed("bucket_histogram") {
  val h = pref.groupBy("k").agg(count(lit(1)).as("m"))
    .agg(max("m").as("max_bucket"),
      (sum(col("m") * (col("m") - 1)) / 2).cast("long").as("pair_bound")).collect()(0)
  plog.println(s"max_bucket=${h.getLong(0)} pair_upper_bound=${h.getLong(1)}")
}
val pairs = timed("d23_full_exact_join_1M") {
  graft.dedup.PrefixJoin.similarPairs(docs, "doc_id", col("text"),
    tauNum, tauDen).count()
}
plog.println(s"true_pairs=$pairs (planted=$dups)")

// --- t27/v22 at 1 M docs
import graft.functions.HashedTfIdf
val feats = timed("t27_features_1M_dim65536") {
  val f = HashedTfIdf.sparseFeatures(docs, "doc_id", col("text"), dim = 65536)
  f.write.mode("overwrite").parquet("/root/repo/target/probe_tfidf_feats")
  spark.read.parquet("/root/repo/target/probe_tfidf_feats")
}
plog.println(s"feature_rows=${feats.count()}")
timed("v22_fleet_100q_over_1M") {
  val qf = feats.where(col("doc_id") % 9900 === 0)
    .withColumnRenamed("doc_id", "query_id")
  val k = HashedTfIdf.topKCosine(feats, qf, k = 10).count()
  plog.println(s"fleet_result_rows=$k")
}
plog.println("probe done")
System.exit(0)
