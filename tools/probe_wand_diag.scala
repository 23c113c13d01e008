// Diagnostic: why did max-score pruning not pay on the Zipf fixture?
// Recompute the ceiling/theta/essential math with public pieces and
// report kept-volume fractions per query. ASCII only.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_wand_diag.plog", true), true)
plog.println("=== wand diag " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)

val V = 100000.0; val L = 30; val n = 1000000L
val text = concat_ws(" ", (0 until L).map(i =>
  concat(lit("w"), floor(pow(lit(V), rand(7100L + i))).cast("long").cast("string"))): _*)
val docs = spark.range(n).select(col("id").as("doc_id"), text.as("text")).localCheckpoint()

import graft.functions.{TextSearch, TextFunctions}
val post = TextSearch.postings(docs, "doc_id", TextFunctions.normalize(col("text"))).localCheckpoint()
val stats = TextSearch.corpusStats(post, "doc_id").localCheckpoint()
val bounds = TextSearch.termBounds(post).localCheckpoint()
val toks = TextFunctions.tokens(TextFunctions.normalize(col("text")))
val queries = docs.where(col("doc_id") % 10000L === 0L)
  .select(col("doc_id").as("query_id"),
    explode(array_distinct(array(element_at(toks, 1), element_at(toks, 15), element_at(toks, 30)))).as("term"))
  .localCheckpoint()

// df distribution of query terms
queries.join(bounds, "term").select("query_id", "term", "df")
  .groupBy("query_id").agg(min("df").as("min_df"), max("df").as("max_df"))
  .agg(expr("percentile(min_df, array(0.1,0.5,0.9))").as("min_df_pct"),
    expr("percentile(max_df, array(0.1,0.5,0.9))").as("max_df_pct"))
  .collect().foreach(r => plog.println("qterm df pct: " + r))

val k1 = 1.2; val b = 0.75; val k = 10
val idfB = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
val ubTf = col("max_tf") * (k1 + 1.0) / (col("max_tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("min_dl") / col("avgdl")))
val qub = queries.distinct().join(bounds, "term").crossJoin(broadcast(stats))
  .select(col("query_id"), col("term"), col("df"), (idfB * ubTf).as("ub"))
import org.apache.spark.sql.expressions.Window
val byImpact = Window.partitionBy("query_id").orderBy(col("ub").desc, col("term"))
val ranked = qub.withColumn("r", row_number().over(byImpact))
  .withColumn("s_r", sum("ub").over(byImpact.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
  .localCheckpoint()

// phase-1 theta per query (mirror of the impl)
val top1 = ranked.filter(col("r") === 1).select("query_id", "term", "df")
val w1 = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) * (col("tf") * (k1 + 1.0) / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
val byContrib = Window.partitionBy("query_id").orderBy(col("w1").desc, col("doc_id"))
val cand1 = post.join(broadcast(top1), "term").crossJoin(broadcast(stats))
  .withColumn("w1", w1).withColumn("c_rk", row_number().over(byContrib))
  .where(col("c_rk") <= 4 * k).select("query_id", "doc_id")
plog.println(s"cand1_rows=${cand1.count()}")
val qt = queries.distinct()
val dfs = ranked.select(col("term"), col("df").cast("double").as("df")).distinct()
val candDocs = cand1.select("doc_id").distinct()
val candPost = post.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
val idf2 = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
val tfn2 = col("tf") * (k1 + 1.0) / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
val scored1 = candPost.join(broadcast(qt), "term")
  .join(broadcast(cand1), Seq("query_id", "doc_id"), "left_semi")
  .join(broadcast(dfs), "term").crossJoin(broadcast(stats))
  .groupBy("query_id", "doc_id")
  .agg(round(sum(idf2 * tfn2), 4).as("score"))
val kth = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
val theta = scored1.withColumn("rk", row_number().over(kth)).where(col("rk") === k)
  .select(col("query_id"), col("score").as("theta"))
plog.println(s"queries_with_theta=${theta.count()} of ${qt.select("query_id").distinct().count()}")
val joined = ranked.join(broadcast(theta), Seq("query_id"), "left").localCheckpoint()
val kept = joined.where(col("s_r") >= coalesce(col("theta"), lit(0.0)) - lit(2e-4))
val volKept = kept.agg(sum("df")).head.getLong(0)
val volAll = joined.agg(sum("df")).head.getLong(0)
plog.println(s"vol_kept=$volKept vol_all=$volAll frac=${volKept.toDouble / volAll}")
// per-query detail for the 5 hottest queries
joined.withColumn("keep", col("s_r") >= coalesce(col("theta"), lit(0.0)) - lit(2e-4))
  .groupBy("query_id").agg(sum("df").as("v"), sum(when(col("keep"), col("df"))).as("vk"),
    first("theta").as("th"), max("ub").as("maxub"), min("ub").as("minub"))
  .orderBy(col("v").desc).limit(8).collect()
  .foreach(r => plog.println("q detail: " + r))
plog.println("done")
