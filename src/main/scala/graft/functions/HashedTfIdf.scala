package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-hashed TF-IDF document embeddings — the "hashing trick"
  * (Weinberger et al., ICML 2009; the standard scalable text
  * vectorizer). Closes the raw-text → vector loop: everything
  * downstream (kNN, IVF, PQ, semantic dedup) assumes an embedding
  * column exists; this derives one from text alone, with no
  * vocabulary dictionary to build, ship, or keep consistent.
  *
  * Representation is SPARSE — (doc_id, bucket, w) rows, only nonzero
  * buckets — which IS an inverted index: retrieval is a postings
  * join, not a dense scan. Dense arrays would carry `dim` doubles per
  * document through every exchange; sparse rows carry one per
  * distinct token hash.
  *
  * Determinism (the property the DuckDB oracle verifies bit-for-bit):
  *  - bucket  = 60-bit md5 prefix of the token, mod `dim`;
  *  - sign    = md5 nibble 16 (< 8 → +1 else −1) — the unbiasing
  *    sign hash of the hashing-trick construction;
  *  - weight  = sign · tf · (ln((N+1)/(df+1)) + 1), summed per
  *    bucket (collisions add signed, as the trick prescribes).
  *
  * Plan shape: one corpus scan → explode tokens → (id, tok) hash
  * aggregate (tf, map-side combined) → token-keyed df aggregate →
  * join tf⋈df on token → bucket re-aggregate per document. The only
  * corpus-sized exchanges are keyed on token and doc — both linear;
  * N arrives as a broadcast 1-row aggregate (no shuffle).
  *
  * 100 TB: `dim` is the memory/collision knob — tests use 1024 so
  * the oracle stays readable; production wants 2^18+ where collision
  * noise vanishes and the bucket join key space is wide enough that
  * no postings list is hot. High-df (stopword) buckets are the skew
  * risk of any inverted index; the `minIdf` guard drops tokens
  * carrying no discrimination before they reach the exchange.
  */
object HashedTfIdf {

  /** Sparse signed-hash TF-IDF rows (idCol, bucket, w). */
  def sparseFeatures(docs: DataFrame, idCol: String, text: Column,
      dim: Int, minIdf: Double = 0.0): DataFrame = {
    val id = col(idCol)
    val toks = docs.select(id,
      explode(split(TextFunctions.normalize(text), " ")).as("tok"))
    val tf = toks.groupBy(idCol, "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val idf = log((col("n_docs") + 1d) / (col("df") + 1d)) + 1d
    val bucket = conv(substring(md5(col("tok")), 1, 15), 16, 10)
      .cast("long") % dim
    val sign = when(conv(substring(md5(col("tok")), 16, 1), 16, 10)
      .cast("int") < 8, 1d).otherwise(-1d)
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .where(idf >= minIdf)
      .groupBy(id, bucket.as("bucket"))
      .agg(sum(sign * col("tf") * idf).as("_w"))
      .select(id, col("bucket"), round(col("_w"), 4).as("w"))
  }

  /** Top-k cosine retrieval over the sparse features: postings join
    * of a (small, broadcast) query-side feature set against the
    * corpus features — the corpus is never shuffled; per-(query, doc)
    * partial dot products combine map-side into one hash aggregate.
    * Ranking is per-query (window over query_id), ties broken by
    * doc_id so the order is deterministic in both engines.
    */
  def topKCosine(features: DataFrame, queryFeatures: DataFrame,
      k: Int): DataFrame = {
    val norms = features.groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val qnorms = queryFeatures.groupBy("query_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("qnrm"))
    val dots = features.join(
        broadcast(queryFeatures.withColumnRenamed("w", "qw")), "bucket")
      .where(col("query_id") =!= col("doc_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("w") * col("qw")).as("dot"))
    val scored = dots
      .join(norms, "doc_id").join(broadcast(qnorms), "query_id")
      .select(col("query_id"), col("doc_id"),
        round(col("dot") / (col("nrm") * col("qnrm")), 4).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "cosine")
  }
}
