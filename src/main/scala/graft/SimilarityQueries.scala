package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{HybridSearch, TextFunctions, TextIndexStore, TextSearch}
import graft.similarity.{BruteForceKnn, CodebookStore, IvfKnn, ProductQuantizer, Quantize, SignLSH, VectorOps}

/** Similarity-search queries over the `embeddings` table (64-dim
  * float vectors): exact brute-force k-NN, per-label centroids,
  * all-pairs near-dup, and sign-LSH bucketing/ANN. Oracles re-derive
  * the identical sequential-fold double arithmetic in DuckDB
  * (`list_reduce(list_prepend(0.0, ...))`), so cosine values match
  * exactly — see similarity.VectorOps.
  */
object SimilarityQueries {

  /** DuckDB dot product with Spark-identical fold order. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)),
       |    (p, q) -> p + q)""".stripMargin

  private def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** DuckDB dot of a literal ±1 plane against an embedding column. */
  private def dotPlaneSql(plane: Seq[Double], e: String): String = {
    val lit = plane.mkString("[", ", ", "]")
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(generate_series(1, len($e)), i -> ($lit::DOUBLE[])[i] * $e[i]::DOUBLE)),
       |      (p, q) -> p + q)""".stripMargin
  }

  private def bucketSql(tablePlanes: Seq[Seq[Double]], e: String): String =
    tablePlanes.zipWithIndex.map { case (plane, b) =>
      s"CASE WHEN ${dotPlaneSql(plane, e)} >= 0 THEN ${1 << b} ELSE 0 END"
    }.mkString("\n    + ")

  // Deterministic plane sets shared by Spark plan and oracle SQL.
  private val bucketPlanes = SignLSH.planes(dim = 64, bits = 8, tables = 1).head

  /** 16 ±1 JL projection planes (seed distinct from the LSH planes). */
  private val rpPlanes =
    graft.similarity.RandomProjection.planes(dim = 64, rd = 16, seed = 7L)
  private val annPlanes = SignLSH.planes(dim = 64, bits = 6, tables = 1, seed = 7L)

  /** One Lloyd assignment step as a CTE: nearest centroid by cosine,
    * ties to the lowest cell — exactly plans.NearestCentroid's rule.
    */
  private def ivfAssignSql(centCte: String, outCte: String): String =
    s"""$outCte AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosineSql("e.embedding", "c.centroid")} DESC, c.cell) AS rnk
       |    FROM embeddings e CROSS JOIN $centCte c)
       |  WHERE rnk = 1)""".stripMargin

  /** One Lloyd update step as a CTE: per-cell componentwise mean,
    * rounded to 6 decimals — IvfKnn.centroids' reproducibility rule.
    */
  private def ivfCentSql(assignCte: String, outCte: String): String =
    s"""$outCte AS (
       |  SELECT cell, list(m ORDER BY pos) AS centroid FROM (
       |    SELECT cell, pos, round(avg(v), 6) AS m FROM (
       |      SELECT cell, unnest(generate_series(1, len(embedding))) - 1 AS pos,
       |             unnest(embedding)::DOUBLE AS v
       |      FROM $assignCte)
       |    GROUP BY cell, pos)
       |  GROUP BY cell)""".stripMargin

  /** DuckDB subvector slice for PQ subspace `s` (1-based inclusive). */
  private def pqSubSql(s: Int, subDim: Int, src: String = "embedding"): String =
    s"list_slice($src, ${s * subDim + 1}, ${(s + 1) * subDim})"

  /** Lloyd assignment CTE over a (vec_id, emb) subvector CTE —
    * ivfAssignSql's rule (cosine argmax, ties to the lowest cell) with
    * the column names PQ's per-subspace chains use.
    */
  private def pqAssignSql(subCte: String, centCte: String, outCte: String): String =
    s"""$outCte AS (
       |  SELECT vec_id, emb, cell FROM (
       |    SELECT e.vec_id, e.emb, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosineSql("e.emb", "c.centroid")} DESC, c.cell) AS rnk
       |    FROM $subCte e CROSS JOIN $centCte c)
       |  WHERE rnk = 1)""".stripMargin

  /** Centroid-mean CTE over a PQ assignment CTE — ivfCentSql's
    * arithmetic (per-position avg rounded to 6) on the `emb` column.
    */
  private def pqCentSql(assignCte: String, outCte: String): String =
    s"""$outCte AS (
       |  SELECT cell, list(m ORDER BY pos) AS centroid FROM (
       |    SELECT cell, pos, round(avg(v), 6) AS m FROM (
       |      SELECT cell, unnest(generate_series(1, len(emb))) - 1 AS pos,
       |             unnest(emb)::DOUBLE AS v
       |      FROM $assignCte)
       |    GROUP BY cell, pos)
       |  GROUP BY cell)""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    // Exact top-10 neighbors for 5 probe vectors — the ANN baseline.
    GraftQuery(
      "v1_knn_topk",
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |         ${cosineSql("q.embedding", "v.embedding")} AS c
         |  FROM embeddings v JOIN embeddings q
         |    ON q.vec_id < 5 AND v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, round(c, 4) AS cosine,
         |  row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
         |FROM scored QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      BruteForceKnn.topK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Per-label mean embedding, flattened to (label, pos, avg) — the
    // columnar form an IVF coarse quantizer trains from.
    GraftQuery(
      "v2_label_centroids",
      """SELECT label, pos, round(avg(v), 6) AS mean_val
        |FROM (SELECT label,
        |        unnest(generate_series(1, len(embedding))) - 1 AS pos,
        |        unnest(embedding)::DOUBLE AS v
        |      FROM embeddings)
        |GROUP BY label, pos
        |ORDER BY label, pos""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(round(avg(col("v").cast("double")), 6).as("mean_val"))
        .orderBy("label", "pos")
    },

    // Embedding near-duplicates, exact all-pairs form (the correctness
    // oracle for the LSH variant below).
    GraftQuery(
      "v3_near_dup_pairs",
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${cosineSql("a.embedding", "b.embedding")}, 4) AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.35
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("e"))
      e.select(col("vec_id").as("id_a"), col("e").as("e_a"))
        .join(e.select(col("vec_id").as("id_b"), col("e").as("e_b")),
          col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          VectorOps.cosine(col("e_a"), col("e_b")).as("c"))
        .filter(col("c") >= 0.35)
        .select(col("id_a"), col("id_b"), round(col("c"), 4).as("cosine"))
        .orderBy("id_a", "id_b")
    },

    // Sign-LSH bucket assignment (8 hyperplanes -> 256 buckets).
    GraftQuery(
      "v4_lsh_buckets",
      s"""SELECT vec_id,
         |  ${bucketSql(bucketPlanes, "embedding")} AS bucket
         |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          SignLSH.bucketOf(VectorOps.asDouble(col("embedding")), bucketPlanes)
            .as("bucket"))
        .orderBy("vec_id")
    },

    // ANN near-pairs: 6-bit single-table LSH candidates refined with
    // exact cosine >= 0.3 — the O(candidates) scale path whose recall
    // is measured against v3 in the test suite.
    GraftQuery(
      "v5_ann_lsh_pairs", {
        val bucket = bucketSql(annPlanes.head, "embedding")
        s"""WITH bkt AS (
           |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings)
           |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |  round(${cosineSql("a.embedding", "b.embedding")}, 4) AS cosine
           |FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.3
           |ORDER BY id_a, id_b""".stripMargin
      }) { (s, dir) =>
      SignLSH.annPairs(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.3, annPlanes)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine"))
        .orderBy("id_a", "id_b")
    },

    // IVF approximate k-NN: label-cell centroids as the coarse
    // quantizer, probe the 2 nearest cells, exact cosine within them —
    // the cell-probing ANN scale path (scans nprobe/|cells| of the
    // corpus) next to v5's hash-bucketing one.
    GraftQuery(
      "v6_ivf_knn",
      s"""WITH cpos AS (
         |  SELECT label, unnest(generate_series(1, len(embedding))) - 1 AS pos,
         |         unnest(embedding)::DOUBLE AS v
         |  FROM embeddings),
         |cent AS (
         |  SELECT label, list(m ORDER BY pos) AS centroid
         |  FROM (SELECT label, pos, round(avg(v), 6) AS m FROM cpos GROUP BY label, pos)
         |  GROUP BY label),
         |probes AS (
         |  SELECT query_id, q_emb, label FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.label,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosineSql("q.embedding", "c.centroid")} DESC, c.label) AS cell_rank
         |    FROM embeddings q CROSS JOIN cent c
         |    WHERE q.vec_id < 5)
         |  WHERE cell_rank <= 2),
         |scored AS (
         |  SELECT p.query_id, v.vec_id AS neighbor_id,
         |         ${cosineSql("p.q_emb", "v.embedding")} AS c
         |  FROM probes p JOIN embeddings v
         |    ON v.label = p.label AND v.vec_id <> p.query_id)
         |SELECT query_id, neighbor_id, round(c, 4) AS cosine,
         |  row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
         |FROM scored QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      IvfKnn.topK(e, e.filter(col("vec_id") < 5), "vec_id", "label", "embedding",
          k = 10, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Same exact top-k as v1 through the bounded-heap AGGREGATE
    // (plans.TopKAggregator, map-side partial top-k) — identical
    // deterministic ordering, so it shares v1's oracle.
    GraftQuery(
      "v7_knn_topk_agg",
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |         ${cosineSql("q.embedding", "v.embedding")} AS c
         |  FROM embeddings v JOIN embeddings q
         |    ON q.vec_id < 5 AND v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, round(c, 4) AS cosine,
         |  row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
         |FROM scored QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      BruteForceKnn.topKAgg(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Int8 scalar quantization: per-vector (mn, scale) + 8-bit codes +
    // reconstruction MSE — the 4x compression pass an ANN index runs
    // before shipping vectors. Codes are exact integers (md5-
    // fingerprinted), mn/scale/mse exact-order double arithmetic.
    GraftQuery(
      "v8_int8_quantize",
      s"""WITH p AS (
         |  SELECT vec_id, embedding AS e,
         |    list_min(embedding)::DOUBLE AS mn,
         |    (list_max(embedding)::DOUBLE - list_min(embedding)::DOUBLE) / 255.0
         |      AS scale
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id, e, mn, scale,
         |    [CASE WHEN scale = 0 THEN 0
         |          ELSE floor((e[i]::DOUBLE - mn) / scale + 0.5)::BIGINT END
         |     for i in generate_series(1, len(e))] AS q
         |  FROM p)
         |SELECT vec_id,
         |  md5(array_to_string(q, ',')) AS q_fp,
         |  list_sum(q)::BIGINT AS q_sum,
         |  round(mn, 6) AS mn_r,
         |  round(scale, 9) AS scale_r,
         |  round(list_reduce(list_prepend(0.0::DOUBLE,
         |      list_transform(generate_series(1, len(e)),
         |        i -> (e[i]::DOUBLE - (mn + q[i] * scale))
         |           * (e[i]::DOUBLE - (mn + q[i] * scale)))),
         |      (p2, q2) -> p2 + q2) / len(e), 9) AS mse_r
         |FROM q ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Quantize.quantized(Tables.load(s, dir, "embeddings"), col("embedding"))
        .select(col("vec_id"),
          md5(array_join(transform(col("q"), _.cast("string")), ",")).as("q_fp"),
          aggregate(col("q"), lit(0L), (a, v) => a + v).as("q_sum"),
          round(col("q_mn"), 6).as("mn_r"),
          round(col("q_scale"), 9).as("scale_r"),
          round(col("q_mse"), 9).as("mse_r"))
        .orderBy("vec_id")
    },

    // Two-stage quantized retrieval (the SQ + rescore ANN pattern):
    // stage 1 scores the full-precision query against the DEQUANTIZED
    // corpus (asymmetric distance — at scale the corpus holds only
    // int8 codes, 4x less IO) and keeps top-20 per query; stage 2
    // re-fetches ONLY those candidates' exact vectors (a broadcast-
    // size join back to the store, C x |queries| rows) and re-ranks to
    // the final top-10 with exact cosine.
    GraftQuery(
      "v9_quantized_rescore", {
        val reconDot =
          s"""list_reduce(list_prepend(0.0::DOUBLE,
             |    list_transform(generate_series(1, len(qe)), i -> qe[i]::DOUBLE * r[i])),
             |    (p2, s2) -> p2 + s2)""".stripMargin
        val reconNorm =
          s"""sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             |    list_transform(generate_series(1, len(r)), i -> r[i] * r[i])),
             |    (p2, s2) -> p2 + s2))""".stripMargin
        val qNorm =
          s"""sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             |    list_transform(generate_series(1, len(qe)), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)),
             |    (p2, s2) -> p2 + s2))""".stripMargin
        s"""WITH p AS (
           |  SELECT vec_id, embedding AS e,
           |    list_min(embedding)::DOUBLE AS mn,
           |    (list_max(embedding)::DOUBLE - list_min(embedding)::DOUBLE) / 255.0
           |      AS scale
           |  FROM embeddings),
           |qz AS (
           |  SELECT vec_id, e, mn, scale,
           |    [CASE WHEN scale = 0 THEN 0
           |          ELSE floor((e[i]::DOUBLE - mn) / scale + 0.5)::BIGINT END
           |     for i in generate_series(1, len(e))] AS q
           |  FROM p),
           |recon AS (
           |  SELECT vec_id, [mn + q[i] * scale for i in generate_series(1, len(e))] AS r
           |  FROM qz),
           |qry AS (
           |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           |  WHERE vec_id < 5),
           |coarse AS (
           |  SELECT query_id, v.vec_id AS neighbor_id, qe,
           |    ($reconDot) / (($qNorm) * ($reconNorm)) AS cq,
           |    row_number() OVER (PARTITION BY query_id ORDER BY
           |      ($reconDot) / (($qNorm) * ($reconNorm)) DESC, v.vec_id) AS crank
           |  FROM qry CROSS JOIN recon v WHERE v.vec_id <> query_id),
           |resc AS (
           |  SELECT query_id, neighbor_id,
           |    ${cosineSql("qe", "x.embedding")} AS c
           |  FROM coarse JOIN embeddings x ON x.vec_id = neighbor_id
           |  WHERE crank <= 20)
           |SELECT query_id, neighbor_id, round(c, 4) AS cosine,
           |  row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
           |FROM resc QUALIFY rank <= 10
           |ORDER BY query_id, rank""".stripMargin
      }) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      Quantize.rescoreTopK(e, e.filter(col("vec_id") < 5), "vec_id",
          "embedding", k = 10, coarseK = 20)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // IVF k-NN over a TRAINED k-means codebook (the full production
    // chain: trainCodebook -> assignCells -> topK). The oracle unrolls
    // the two Lloyd iterations as CTEs — seeds are the 4 lowest-id
    // vectors, assignment is argmax cosine with ties to the lowest
    // cell, centroid components round to 6 decimals — so every
    // intermediate double matches the engine bit-for-bit and the
    // final ranking is exact, not a weaker rows-only check.
    GraftQuery(
      "v11_ivf_trained",
      s"""WITH seeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |         embedding::DOUBLE[] AS centroid
         |  FROM embeddings ORDER BY vec_id LIMIT 4),
         |${ivfAssignSql("seeds", "a1")},
         |${ivfCentSql("a1", "cent1")},
         |${ivfAssignSql("cent1", "a2")},
         |${ivfCentSql("a2", "cent2")},
         |${ivfAssignSql("cent2", "af")},
         |${ivfCentSql("af", "tc")},
         |probes AS (
         |  SELECT query_id, q_emb, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosineSql("q.embedding", "c.centroid")} DESC, c.cell)
         |        AS cell_rank
         |    FROM embeddings q CROSS JOIN tc c
         |    WHERE q.vec_id < 5)
         |  WHERE cell_rank <= 2),
         |scored AS (
         |  SELECT p.query_id, v.vec_id AS neighbor_id,
         |         ${cosineSql("p.q_emb", "v.embedding")} AS c
         |  FROM probes p JOIN af v
         |    ON v.cell = p.cell AND v.vec_id <> p.query_id)
         |SELECT query_id, neighbor_id, round(c, 4) AS cosine,
         |  row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
         |FROM scored QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      // production form: the codebook is a PERSISTED artifact
      // (CodebookStore) — trained once per (corpus, k, iters), read by
      // every later run; bit-identical to the inline train
      val codebook = CodebookStore.trained(s, dir, "embeddings",
        "vec_id", "embedding", k = 4, iters = 2)
      val assigned = IvfKnn.assignCells(e, "embedding",
        IvfKnn.collectCodebook(codebook, "cell"), "_cell")
      IvfKnn.topK(assigned, assigned.filter(col("vec_id") < 5), "vec_id", "_cell",
          "embedding", k = 10, nprobe = 2,
          probeCodebook = Some(CodebookStore.trained(s, dir, "embeddings",
            "vec_id", "embedding", k = 4, iters = 3)))
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Hybrid retrieval (the ES + vector-db default): BM25 lexical
    // top-100 over documents and cosine top-100 over embeddings,
    // fused by reciprocal-rank fusion — ranks, not raw scores, so no
    // cross-list calibration, and the fused score is a sum of exact
    // rationals (bit-identical across engines by construction). One
    // union + one hash aggregate fuses the bounded lists.
    GraftQuery(
      "t18_hybrid_rrf", {
        val w = """ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                  |      * (m.tf * (1.2 + 1.0)
                  |         / (m.tf + 1.2 * (0.25 + 0.75 * m.dl / avgdl)))""".stripMargin
        s"""${TextQueries.bm25IndexCte},
           |m AS (SELECT * FROM post WHERE term IN ('vector', 'window', 'merge')),
           |dft AS (SELECT term, count(*)::DOUBLE AS df FROM m GROUP BY term),
           |bsc AS (
           |  SELECT m.doc_id, sum($w) AS score
           |  FROM m JOIN dft USING (term) CROSS JOIN stats
           |  GROUP BY m.doc_id),
           |br AS (
           |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
           |  FROM bsc QUALIFY rank <= 100),
           |vq AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |vsc AS (
           |  SELECT v.vec_id AS doc_id, ${cosineSql("qe", "v.embedding")} AS c
           |  FROM embeddings v CROSS JOIN vq WHERE v.vec_id <> 0),
           |vr AS (
           |  SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS rank
           |  FROM vsc QUALIFY rank <= 100),
           |u AS (
           |  SELECT doc_id, 1.0 / (60 + rank) AS c FROM br
           |  UNION ALL
           |  SELECT doc_id, 1.0 / (60 + rank) AS c FROM vr)
           |SELECT doc_id, count(*) AS n_lists, round(sum(c), 6) AS rrf_score
           |FROM u GROUP BY doc_id
           |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin
      }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.load(s, dir, "embeddings")
      // production form: the lexical leg queries the PERSISTED
      // postings index + stored corpus stats (TextIndexStore) — the
      // one-off index build amortizes across the query fleet instead
      // of being rebuilt inline per run, and the term filter lands on
      // the stored parquet scan as a pushed predicate
      val post = TextIndexStore.postings(s, dir)
      // lexical list: the matched set GROWS with the corpus (every doc
      // containing a query term), so the global top-100 rank is a
      // salted two-level heap — per-salt group limits bound every sort
      // partition, and the final partition-less window orders ≤ 64·100
      // rows (lossless: the global top-100 by (score, doc_id) is a
      // subset of the union of per-salt top-100s under the same total
      // order). A bare Window.orderBy here would plan a single task
      // over the whole matched set.
      val bScored = TextSearch
        .bm25OverPostings(post, "doc_id", Seq("vector", "window", "merge"),
          stats = Some(TextIndexStore.stats(s, dir)))
        .withColumn("_salt", pmod(hash(col("doc_id")), lit(64)))
        .withColumn("_rs", row_number().over(Window.partitionBy("_salt")
          .orderBy(col("score").desc, col("doc_id"))))
        .filter(col("_rs") <= 100)
      val bRanked = bScored
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rank") <= 100)
        .select("doc_id", "rank")
      // semantic list: exact top-100 for the vec_id=0 probe
      val vRanked = BruteForceKnn.topK(emb, emb.filter(col("vec_id") === 0),
          "vec_id", "embedding", k = 100)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      HybridSearch.rrfFuse(Seq(bRanked, vRanked), "doc_id", k = 60)
        .select(col("doc_id"), col("n_lists"),
          round(col("rrf_score"), 6).as("rrf_score"))
        .orderBy(col("rrf_score").desc, col("doc_id")).limit(20)
    },

    // Hybrid retrieval, FLEET form: five (lexical-terms + probe-
    // vector) queries fused per query in ONE job. Unlike t18's
    // single-probe shape, the vector leg routes through the TRAINED
    // IVF index (v11's codebook chain — probes scan nprobe/|cells| of
    // the corpus, never all of it per query) and the lexical leg
    // scores the PERSISTED postings; fusion is one union + one hash
    // aggregate keyed (query, doc), so N queries cost the same
    // exchanges as one. Oracle = t13's lexical CTEs + v11's Lloyd
    // CTEs + per-query RRF; ranking windows order by the ROUNDED
    // fused score (a sum of exact rationals) for cross-engine ties.
    GraftQuery(
      "t19_hybrid_batch",
      s"""${TextQueries.bm25IndexCte},
         |qt AS (SELECT doc_id AS query_id,
         |         unnest(list_distinct([a[1], a[3], a[5]])) AS term
         |       FROM (SELECT doc_id, string_split(norm, ' ') AS a FROM n)
         |       WHERE doc_id < 5),
         |dft AS (SELECT term, count(*)::DOUBLE AS df FROM post
         |        WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
         |bsc AS (
         |  SELECT q.query_id, p.doc_id,
         |    sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         |      * (p.tf * (1.2 + 1.0)
         |         / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / avgdl)))) AS score
         |  FROM post p JOIN qt q USING (term) JOIN dft USING (term)
         |  CROSS JOIN stats
         |  GROUP BY q.query_id, p.doc_id),
         |br AS (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM bsc QUALIFY rank <= 100),
         |seeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |         embedding::DOUBLE[] AS centroid
         |  FROM embeddings ORDER BY vec_id LIMIT 4),
         |${ivfAssignSql("seeds", "a1")},
         |${ivfCentSql("a1", "cent1")},
         |${ivfAssignSql("cent1", "a2")},
         |${ivfCentSql("a2", "cent2")},
         |${ivfAssignSql("cent2", "af")},
         |${ivfCentSql("af", "tc")},
         |probes AS (
         |  SELECT query_id, q_emb, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosineSql("q.embedding", "c.centroid")} DESC, c.cell)
         |        AS cell_rank
         |    FROM embeddings q CROSS JOIN tc c
         |    WHERE q.vec_id < 5)
         |  WHERE cell_rank <= 2),
         |vr AS (
         |  SELECT query_id, neighbor_id AS doc_id, rank FROM (
         |    SELECT p.query_id, v.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY p.query_id
         |        ORDER BY ${cosineSql("p.q_emb", "v.embedding")} DESC, v.vec_id)
         |        AS rank
         |    FROM probes p JOIN af v
         |      ON v.cell = p.cell AND v.vec_id <> p.query_id)
         |  WHERE rank <= 100),
         |u AS (
         |  SELECT query_id, doc_id, 1.0 / (60 + rank) AS c FROM br
         |  UNION ALL
         |  SELECT query_id, doc_id, 1.0 / (60 + rank) AS c FROM vr),
         |f AS (
         |  SELECT query_id, doc_id, count(*) AS n_lists,
         |         round(sum(c), 6) AS rrf_score
         |  FROM u GROUP BY query_id, doc_id)
         |SELECT query_id, doc_id, n_lists, rrf_score,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf_score DESC, doc_id) AS rank
         |FROM f QUALIFY rank <= 20
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val toks = TextFunctions.tokens(TextFunctions.normalize(col("text")))
      val queries = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(array(
            element_at(toks, 1), element_at(toks, 3), element_at(toks, 5))))
            .as("term"))
      val bR = TextSearch.bm25Batch(TextIndexStore.postings(s, dir), "doc_id",
          queries, stats = Some(TextIndexStore.stats(s, dir)))
        .withColumn("rank", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rank") <= 100)
        .select("query_id", "doc_id", "rank")
      // stored codebook (CodebookStore): the fleet probes a persisted
      // k×d artifact instead of re-running Lloyd per execution
      val codebook = CodebookStore.trained(s, dir, "embeddings",
        "vec_id", "embedding", k = 4, iters = 2)
      val assigned = IvfKnn.assignCells(emb, "embedding",
        IvfKnn.collectCodebook(codebook, "cell"), "_cell")
      // probe centroids from the store too: centroids-of-assignment ==
      // trainCodebook(iters+1) bit-for-bit, so no corpus pass here
      val vR = IvfKnn.topK(assigned, assigned.filter(col("vec_id") < 5), "vec_id",
          "_cell", "embedding", k = 100, nprobe = 2,
          probeCodebook = Some(CodebookStore.trained(s, dir, "embeddings",
            "vec_id", "embedding", k = 4, iters = 3)))
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      HybridSearch.rrfFuse(Seq(bR, vR), Seq("query_id", "doc_id"), 60)
        .withColumn("rrf_score", round(col("rrf_score"), 6))
        .withColumn("rank", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("rrf_score").desc, col("doc_id"))))
        .filter(col("rank") <= 20)
        .select("query_id", "doc_id", "n_lists", "rrf_score", "rank")
        .orderBy("query_id", "rank")
    },

    // Semantic dedup (SemDeDup-shaped): drop vectors dominated by a
    // smaller-id near-duplicate (cosine >= 0.35) within their label
    // cell — cell-blocked pairs, one equi-shuffle, deterministic
    // lowest-id-wins keep rule. The oracle derives the dominated set
    // with the identical fold-order cosine, then anti-joins (NOT
    // EXISTS would put the cosine lambda in a correlated context
    // DuckDB's binder rejects).
    GraftQuery(
      "v10_semantic_dedup",
      s"""WITH dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.35)
         |SELECT v.vec_id, v.label FROM embeddings v
         |ANTI JOIN dropped d ON v.vec_id = d.vec_id
         |ORDER BY v.vec_id""".stripMargin) { (s, dir) =>
      graft.similarity.SemanticDedup.kept(
          Tables.load(s, dir, "embeddings"),
          idCol = "vec_id", vecCol = "embedding", cellCol = "label",
          minCosine = 0.35)
        .select("vec_id", "label")
        .orderBy("vec_id")
    },

    // Semantic dedup over TRAINED IVF cells — the 100 TB form. v10's
    // label cells are fixed-cardinality, so at 100x corpus each cell
    // grows 100x and within-cell pair work 10,000x (SURVEY §9.2
    // measured the pathology at ~160 M pairs); keptIvf instead sizes
    // a k-means codebook as k = n / targetCellSize, which keeps the
    // expected pair volume at n·targetCellSize — LINEAR in corpus
    // size at a fixed knob. The oracle unrolls the two Lloyd
    // iterations as CTEs (v11's technique) with a COMPUTED seed count
    // (count(*) // targetCellSize), so it tracks the engine's n-derived
    // k at any scale factor and every intermediate double matches
    // bit-for-bit.
    GraftQuery(
      "v12_semantic_dedup_ivf",
      s"""WITH seeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |         embedding::DOUBLE[] AS centroid
         |  FROM embeddings ORDER BY vec_id
         |  LIMIT greatest(1, (SELECT count(*) // 64 FROM embeddings))),
         |${ivfAssignSql("seeds", "a1")},
         |${ivfCentSql("a1", "cent1")},
         |${ivfAssignSql("cent1", "a2")},
         |${ivfCentSql("a2", "cent2")},
         |${ivfAssignSql("cent2", "af")},
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.35)
         |SELECT v.vec_id, v.label FROM embeddings v
         |ANTI JOIN dropped d ON v.vec_id = d.vec_id
         |ORDER BY v.vec_id""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      // k = n/targetCellSize exactly as keptIvf would derive it, but
      // the trained codebook comes from the persisted store
      val k = math.max(1, (emb.count() / 64).toInt)
      graft.similarity.SemanticDedup.keptIvf(emb,
          idCol = "vec_id", vecCol = "embedding",
          minCosine = 0.35, targetCellSize = 64, kmeansIters = 2,
          codebook = Some(CodebookStore.trained(s, dir, "embeddings",
            "vec_id", "embedding", k, iters = 2)))
        .select("vec_id", "label")
        .orderBy("vec_id")
    },

    // Product quantization + ADC retrieval (Jégou et al. 2011) — the
    // MEMORY-side ANN scale path: each 64-dim vector ships as m=4
    // subspace codes (4 ints vs 64 floats); queries score the whole
    // corpus via a per-query lookup table (m×k dots) + m adds per
    // vector, then the top-coarseK candidates rescore exact. The
    // oracle unrolls all four per-subspace Lloyd chains (v11's
    // technique over list_slice'd subvectors), rebuilds the same LUT,
    // and rounds the ADC sum to 6 decimals before ranking (the
    // cross-engine float discipline) — every intermediate matches.
    GraftQuery(
      "v13_pq_adc",
      s"""WITH ${(0 until 4).map { s =>
            s"""sub$s AS (SELECT vec_id, ${pqSubSql(s, 16)} AS emb FROM embeddings),
               |seed$s AS (
               |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
               |         emb::DOUBLE[] AS centroid
               |  FROM sub$s ORDER BY vec_id LIMIT 4),
               |${pqAssignSql(s"sub$s", s"seed$s", s"a1_$s")},
               |${pqCentSql(s"a1_$s", s"c1_$s")},
               |${pqAssignSql(s"sub$s", s"c1_$s", s"af$s")}""".stripMargin
          }.mkString(",\n")},
         |codes AS (
         |  ${(0 until 4).map(s =>
              s"SELECT vec_id, $s AS subspace, cell FROM af$s").mkString("\n  UNION ALL ")}),
         |lut AS (
         |  ${(0 until 4).map(s =>
              s"""SELECT q.vec_id AS query_id, $s AS subspace, c.cell,
                 |    ${dotSql(pqSubSql(s, 16, "q.embedding"), "c.centroid")} AS d
                 |  FROM embeddings q CROSS JOIN c1_$s c WHERE q.vec_id < 5""".stripMargin)
              .mkString("\n  UNION ALL ")}),
         |adc AS (
         |  SELECT l.query_id, co.vec_id, round(sum(l.d), 6) AS adc
         |  FROM codes co JOIN lut l ON co.subspace = l.subspace AND co.cell = l.cell
         |  WHERE co.vec_id <> l.query_id
         |  GROUP BY 1, 2),
         |coarse AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS cr
         |    FROM adc) WHERE cr <= 30)
         |SELECT c.query_id, c.vec_id AS neighbor_id,
         |  round(${cosineSql("q.embedding", "v.embedding")}, 4) AS cosine,
         |  row_number() OVER (PARTITION BY c.query_id
         |    ORDER BY ${cosineSql("q.embedding", "v.embedding")} DESC, c.vec_id) AS rank
         |FROM coarse c
         |JOIN embeddings v ON v.vec_id = c.vec_id
         |JOIN embeddings q ON q.vec_id = c.query_id
         |QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      // production form: the m subquantizers are a PERSISTED artifact
      // (CodebookStore.pqTrained) — trained once per (corpus, recipe),
      // bit-identical to the inline train
      val books = CodebookStore.pqTrained(s, dir, "embeddings",
        "vec_id", "embedding", m = 4, subDim = 16, k = 4, iters = 1)
      // stored codes too: the ADC scan reads m ints/row, never the
      // corpus floats (those appear only in the candidate-sized
      // rescore join)
      val codes = CodebookStore.pqCodes(s, dir, "embeddings",
        "vec_id", "embedding", m = 4, subDim = 16, k = 4, iters = 1)
      ProductQuantizer.adcTopK(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", subDim = 16, books, k = 10, coarseK = 30,
          storedCodes = Some(codes))
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Semantic decontamination — the vector analogue of d12: training
    // vectors (vec_id >= 50) whose embedding matches ANY benchmark
    // vector (vec_id < 50) at cosine >= 0.30 are retired, comparing
    // only within trained IVF cells (the same persisted codebook v12
    // reads — one store build serves both). Benchmark side broadcasts;
    // the corpus never shuffles. Oracle reuses the v12 Lloyd chain
    // verbatim, then splits af into the two roles.
    GraftQuery(
      "v14_semantic_decontam",
      s"""WITH seeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |         embedding::DOUBLE[] AS centroid
         |  FROM embeddings ORDER BY vec_id
         |  LIMIT greatest(1, (SELECT count(*) // 64 FROM embeddings))),
         |${ivfAssignSql("seeds", "a1")},
         |${ivfCentSql("a1", "cent1")},
         |${ivfAssignSql("cent1", "a2")},
         |${ivfCentSql("a2", "cent2")},
         |${ivfAssignSql("cent2", "af")},
         |contaminated AS (
         |  SELECT DISTINCT t.vec_id
         |  FROM af t JOIN af b ON t.cell = b.cell
         |  WHERE t.vec_id >= 50 AND b.vec_id < 50
         |    AND ${cosineSql("t.embedding", "b.embedding")} >= 0.30)
         |SELECT v.vec_id, v.label FROM embeddings v
         |ANTI JOIN contaminated c ON v.vec_id = c.vec_id
         |WHERE v.vec_id >= 50
         |ORDER BY v.vec_id""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val k = math.max(1, (e.count() / 64).toInt)
      val codebook = CodebookStore.trained(s, dir, "embeddings",
        "vec_id", "embedding", k, iters = 2)
      graft.similarity.SemanticDecontam.kept(
          e.filter(col("vec_id") >= 50), e.filter(col("vec_id") < 50),
          idCol = "vec_id", vecCol = "embedding",
          minCosine = 0.30, codebook = codebook)
        .select("vec_id", "label")
        .orderBy("vec_id")
    },

    // Hard-negative mining for contrastive training: per query the
    // top-10 most-similar vectors with a DIFFERENT label — near
    // misses, mined through the same IVF probe path as v11 with the
    // group-mismatch predicate applied BEFORE the ranking window.
    // Oracle = v11's chain + the label filter (IS DISTINCT FROM
    // mirrors Spark's null-safe negation).
    GraftQuery(
      "v15_hard_negatives",
      s"""WITH seeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |         embedding::DOUBLE[] AS centroid
         |  FROM embeddings ORDER BY vec_id LIMIT 4),
         |${ivfAssignSql("seeds", "a1")},
         |${ivfCentSql("a1", "cent1")},
         |${ivfAssignSql("cent1", "a2")},
         |${ivfCentSql("a2", "cent2")},
         |${ivfAssignSql("cent2", "af")},
         |${ivfCentSql("af", "tc")},
         |probes AS (
         |  SELECT query_id, q_emb, q_label, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS q_emb,
         |      q.label AS q_label, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosineSql("q.embedding", "c.centroid")} DESC, c.cell)
         |        AS cell_rank
         |    FROM embeddings q CROSS JOIN tc c
         |    WHERE q.vec_id < 5)
         |  WHERE cell_rank <= 2),
         |scored AS (
         |  SELECT p.query_id, v.vec_id AS neighbor_id,
         |         ${cosineSql("p.q_emb", "v.embedding")} AS c
         |  FROM probes p JOIN af v
         |    ON v.cell = p.cell AND v.vec_id <> p.query_id
         |  JOIN embeddings ve ON ve.vec_id = v.vec_id
         |  WHERE ve.label IS DISTINCT FROM p.q_label)
         |SELECT query_id, neighbor_id, round(c, 4) AS cosine,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY c DESC, neighbor_id) AS rank
         |FROM scored QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val codebook = CodebookStore.trained(s, dir, "embeddings",
        "vec_id", "embedding", k = 4, iters = 2)
      val assigned = IvfKnn.assignCells(e, "embedding",
        IvfKnn.collectCodebook(codebook, "cell"), "_cell")
      graft.similarity.HardNegatives.topK(assigned,
          assigned.filter(col("vec_id") < 5),
          "vec_id", "_cell", "embedding", "label", k = 10, nprobe = 2,
          probeCodebook = Some(CodebookStore.trained(s, dir, "embeddings",
            "vec_id", "embedding", k = 4, iters = 3)))
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Topic-balanced sampling — the similarity × sampling composition
    // a cluster-resampled corpus curation run executes: trained IVF
    // cells are the topics (v12's stored codebook, k = n/64), and the
    // temperature mixture (t20's math, α=0.5, 30% target) flattens
    // over-represented topics. Cell assignment is one codegen'd
    // argmax (checkpointed once for the two consumers); rates derive
    // from one |cells|-row aggregate broadcast back; the corpus never
    // shuffles. Oracle = v12's Lloyd chain + t20's threshold CTEs
    // over the cell column.
    GraftQuery(
      "p3_topic_mixture",
      s"""WITH seeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |         embedding::DOUBLE[] AS centroid
         |  FROM embeddings ORDER BY vec_id
         |  LIMIT greatest(1, (SELECT count(*) // 64 FROM embeddings))),
         |${ivfAssignSql("seeds", "a1")},
         |${ivfCentSql("a1", "cent1")},
         |${ivfAssignSql("cent1", "a2")},
         |${ivfCentSql("a2", "cent2")},
         |${ivfAssignSql("cent2", "af")},
         |c AS (SELECT cell, count(*) AS n_total FROM af GROUP BY cell),
         |t AS (SELECT sum(n_total)::DOUBLE AS nn,
         |        sum(pow(n_total::DOUBLE, 0.5)) AS z FROM c),
         |r AS (SELECT cell, n_total,
         |        floor(least(1.0, 0.3 * nn * pow(n_total::DOUBLE, 0.5) / z
         |            / n_total::DOUBLE) * 4096 + 0.5)::INT AS thr
         |      FROM c, t),
         |k AS (SELECT a.cell FROM af a JOIN r ON a.cell = r.cell
         |      WHERE ('0x' || substr(md5(a.vec_id::varchar), 1, 3))::INT < r.thr)
         |SELECT r.cell AS topic, r.n_total, coalesce(kk.n_kept, 0) AS n_kept
         |FROM r LEFT JOIN (
         |  SELECT cell, count(*) AS n_kept FROM k GROUP BY cell) kk
         |  ON r.cell = kk.cell
         |ORDER BY topic""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val k = math.max(1, (e.count() / 64).toInt)
      val codebook = CodebookStore.trained(s, dir, "embeddings",
        "vec_id", "embedding", k, iters = 2)
      val assigned = IvfKnn.assignCells(e, "embedding",
          IvfKnn.collectCodebook(codebook, "cell"), "topic")
        .select("vec_id", "topic")
        .localCheckpoint()
      val kept = graft.operators.Sampling.mixture(assigned, "vec_id", "topic",
          alpha = 0.5, targetFraction = 0.3)
        .groupBy("topic").agg(count(lit(1)).as("n_kept"))
      graft.operators.Sampling.mixtureThresholds(assigned, "topic",
          alpha = 0.5, targetFraction = 0.3)
        .select(col("topic"), col("n_total"))
        .join(kept.withColumnRenamed("topic", "_kt"),
          col("topic") === col("_kt"), "left")
        .select(col("topic"), col("n_total"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("topic")
    },

    // IVF+PQ retrieval — the FAISS IVFPQ shape (no-residual variant):
    // coarse cells gate WHICH code rows each query scores
    // (nprobe/|cells| of the corpus, v11's probe discipline), PQ
    // codes make each scored row m lookups instead of d flops. Every
    // artifact (coarse codebook, probe centroids, PQ books, codes)
    // comes from the persisted store. Oracle = the coarse Lloyd chain
    // + v13's four subspace chains + the cell-gated ADC fusion.
    GraftQuery(
      "v16_ivfpq",
      s"""WITH seeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |         embedding::DOUBLE[] AS centroid
         |  FROM embeddings ORDER BY vec_id LIMIT 4),
         |${ivfAssignSql("seeds", "a1")},
         |${ivfCentSql("a1", "cent1")},
         |${ivfAssignSql("cent1", "a2")},
         |${ivfCentSql("a2", "cent2")},
         |${ivfAssignSql("cent2", "af")},
         |${ivfCentSql("af", "tc")},
         |${(0 until 4).map { s =>
            s"""sub$s AS (SELECT vec_id, ${pqSubSql(s, 16)} AS emb FROM embeddings),
               |seed$s AS (
               |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
               |         emb::DOUBLE[] AS centroid
               |  FROM sub$s ORDER BY vec_id LIMIT 4),
               |${pqAssignSql(s"sub$s", s"seed$s", s"a1_$s")},
               |${pqCentSql(s"a1_$s", s"c1_$s")},
               |${pqAssignSql(s"sub$s", s"c1_$s", s"af$s")}""".stripMargin
          }.mkString(",\n")},
         |codes AS (
         |  ${(0 until 4).map(s =>
              s"SELECT vec_id, $s AS subspace, cell FROM af$s").mkString("\n  UNION ALL ")}),
         |probes AS (
         |  SELECT query_id, cell FROM (
         |    SELECT q.vec_id AS query_id, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosineSql("q.embedding", "c.centroid")} DESC, c.cell)
         |        AS cell_rank
         |    FROM embeddings q CROSS JOIN tc c
         |    WHERE q.vec_id < 5)
         |  WHERE cell_rank <= 2),
         |cand AS (
         |  SELECT p.query_id, v.vec_id
         |  FROM probes p JOIN af v
         |    ON v.cell = p.cell AND v.vec_id <> p.query_id),
         |lut AS (
         |  ${(0 until 4).map(s =>
              s"""SELECT q.vec_id AS query_id, $s AS subspace, c.cell,
                 |    ${dotSql(pqSubSql(s, 16, "q.embedding"), "c.centroid")} AS d
                 |  FROM embeddings q CROSS JOIN c1_$s c WHERE q.vec_id < 5""".stripMargin)
              .mkString("\n  UNION ALL ")}),
         |adc AS (
         |  SELECT c.query_id, c.vec_id, round(sum(l.d), 6) AS adc
         |  FROM cand c
         |  JOIN codes co ON co.vec_id = c.vec_id
         |  JOIN lut l ON l.query_id = c.query_id
         |    AND l.subspace = co.subspace AND l.cell = co.cell
         |  GROUP BY 1, 2),
         |coarse AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS cr
         |    FROM adc) WHERE cr <= 30)
         |SELECT c.query_id, c.vec_id AS neighbor_id,
         |  round(${cosineSql("q.embedding", "v.embedding")}, 4) AS cosine,
         |  row_number() OVER (PARTITION BY c.query_id
         |    ORDER BY ${cosineSql("q.embedding", "v.embedding")} DESC, c.vec_id) AS rank
         |FROM coarse c
         |JOIN embeddings v ON v.vec_id = c.vec_id
         |JOIN embeddings q ON q.vec_id = c.query_id
         |QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val probeBook = CodebookStore.trained(s, dir, "embeddings",
        "vec_id", "embedding", k = 4, iters = 3)
      // index + books from the INCREMENTALLY-maintained store —
      // bit-identical to CodebookStore's on a static corpus
      // (VectorIndexStoreSpec), so this oracle also pins the
      // incremental serving path; retrieval reads (id, cell, codes)
      // and never touches the corpus floats until the rescore join
      val recipe = graft.similarity.VectorIndexStore.Recipe(
        coarseK = 4, coarseIters = 2, m = 4, subDim = 16, k = 4, iters = 1)
      val books = graft.similarity.VectorIndexStore.books(s, dir, "embeddings",
        "vec_id", "embedding", recipe)
      val assignedCodes = graft.similarity.VectorIndexStore.index(s, dir,
        "embeddings", "vec_id", "embedding", recipe)
      ProductQuantizer.ivfAdcTopK(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", subDim = 16, books,
          assignedCodes, "_cell", probeBook,
          k = 10, coarseK = 30, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Residual IVF+PQ — the FAISS-proper `by_residual=true` form: PQ
    // books trained on x − centroid(cell) (residuals concentrate near
    // the origin once the coarse structure is removed, so the same m/k
    // budget resolves finer detail — the §9.10 ceiling lift), and the
    // approximate score decomposes exactly as ⟨q, centroid⟩ + ⟨q, r̂⟩:
    // a per-(query, probed-cell) offset plus the usual m LUT lookups.
    // All four artifacts store-served. Oracle = v16's coarse chain +
    // a residual CTE + four residual Lloyd chains + the offset ADC.
    GraftQuery(
      "v17_ivfpq_residual",
      s"""WITH seeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |         embedding::DOUBLE[] AS centroid
         |  FROM embeddings ORDER BY vec_id LIMIT 4),
         |${ivfAssignSql("seeds", "a1")},
         |${ivfCentSql("a1", "cent1")},
         |${ivfAssignSql("cent1", "a2")},
         |${ivfCentSql("a2", "cent2")},
         |${ivfAssignSql("cent2", "af")},
         |res AS (
         |  SELECT a.vec_id,
         |    list_transform(generate_series(1, len(a.embedding)),
         |      i -> a.embedding[i]::DOUBLE - c.centroid[i]) AS resid,
         |    a.cell
         |  FROM af a JOIN cent2 c ON a.cell = c.cell),
         |${(0 until 4).map { s =>
            s"""rsub$s AS (SELECT vec_id, ${pqSubSql(s, 16, "resid")} AS emb FROM res),
               |rseed$s AS (
               |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
               |         emb::DOUBLE[] AS centroid
               |  FROM rsub$s ORDER BY vec_id LIMIT 4),
               |${pqAssignSql(s"rsub$s", s"rseed$s", s"ra1_$s")},
               |${pqCentSql(s"ra1_$s", s"rc1_$s")},
               |${pqAssignSql(s"rsub$s", s"rc1_$s", s"raf$s")}""".stripMargin
          }.mkString(",\n")},
         |codes AS (
         |  ${(0 until 4).map(s =>
              s"SELECT vec_id, $s AS subspace, cell FROM raf$s").mkString("\n  UNION ALL ")}),
         |probes AS (
         |  SELECT query_id, cell, off FROM (
         |    SELECT q.vec_id AS query_id, c.cell,
         |      ${dotSql("q.embedding", "c.centroid")} AS off,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosineSql("q.embedding", "c.centroid")} DESC, c.cell)
         |        AS cell_rank
         |    FROM embeddings q CROSS JOIN cent2 c
         |    WHERE q.vec_id < 5)
         |  WHERE cell_rank <= 2),
         |cand AS (
         |  SELECT p.query_id, v.vec_id, p.off
         |  FROM probes p JOIN af v
         |    ON v.cell = p.cell AND v.vec_id <> p.query_id),
         |lut AS (
         |  ${(0 until 4).map(s =>
              s"""SELECT q.vec_id AS query_id, $s AS subspace, c.cell,
                 |    ${dotSql(pqSubSql(s, 16, "q.embedding"), "c.centroid")} AS d
                 |  FROM embeddings q CROSS JOIN rc1_$s c WHERE q.vec_id < 5""".stripMargin)
              .mkString("\n  UNION ALL ")}),
         |adc AS (
         |  SELECT c.query_id, c.vec_id, round(max(c.off) + sum(l.d), 6) AS adc
         |  FROM cand c
         |  JOIN codes co ON co.vec_id = c.vec_id
         |  JOIN lut l ON l.query_id = c.query_id
         |    AND l.subspace = co.subspace AND l.cell = co.cell
         |  GROUP BY 1, 2),
         |coarse AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS cr
         |    FROM adc) WHERE cr <= 30)
         |SELECT c.query_id, c.vec_id AS neighbor_id,
         |  round(${cosineSql("q.embedding", "v.embedding")}, 4) AS cosine,
         |  row_number() OVER (PARTITION BY c.query_id
         |    ORDER BY ${cosineSql("q.embedding", "v.embedding")} DESC, c.vec_id) AS rank
         |FROM coarse c
         |JOIN embeddings v ON v.vec_id = c.vec_id
         |JOIN embeddings q ON q.vec_id = c.query_id
         |QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      // all three artifacts from the INCREMENTALLY-maintained store
      // (bit-identical to CodebookStore's residual chain on a static
      // corpus — VectorIndexStoreSpec), so the residual oracle also
      // pins the incremental serving path
      val recipe = graft.similarity.VectorIndexStore.Recipe(
        coarseK = 4, coarseIters = 2, m = 4, subDim = 16, k = 4, iters = 1,
        residual = true)
      val coarseBook = graft.similarity.VectorIndexStore.coarse(s, dir,
        "embeddings", "vec_id", "embedding", recipe)
      val books = graft.similarity.VectorIndexStore.books(s, dir, "embeddings",
        "vec_id", "embedding", recipe)
      val idx = graft.similarity.VectorIndexStore.index(s, dir, "embeddings",
        "vec_id", "embedding", recipe)
      ProductQuantizer.ivfAdcTopKResidual(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", subDim = 16, books,
          idx, "_cell", coarseBook,
          k = 10, coarseK = 30, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Multi-probe LSH (Lv et al., VLDB 2007): one stored table, each
    // query probes its own bucket plus the nprobe-1 single-bit flips
    // with the smallest hyperplane margin — L-table recall at 1/L of
    // the index memory. The memory/recall trade that matters when the
    // INDEX side is the 100 TB side.
    GraftQuery(
      "v18_multiprobe_lsh", {
        val dotsList = bucketPlanes.map(p => dotPlaneSql(p, "q.embedding"))
          .mkString("[\n    ", ",\n    ", "\n  ]")
        val bucketFromDots = (0 until 8)
          .map(b => s"(CASE WHEN dots[${b + 1}] >= 0 THEN ${1 << b} ELSE 0 END)")
          .mkString(" + ")
        s"""WITH qd AS (
           |  SELECT q.vec_id AS qid, q.embedding AS q_emb, $dotsList AS dots
           |  FROM embeddings q WHERE q.vec_id < 5),
           |qb AS (SELECT qid, q_emb, dots, $bucketFromDots AS bucket FROM qd),
           |bits AS (
           |  SELECT qid, bucket, t.b, abs(dots[t.b + 1]) AS m
           |  FROM qb CROSS JOIN range(0, 8) t(b)),
           |flips AS (
           |  SELECT qid, bucket, b FROM (
           |    SELECT qid, bucket, b,
           |      row_number() OVER (PARTITION BY qid ORDER BY m, b) AS rn
           |    FROM bits) WHERE rn <= 3),
           |probes AS (
           |  SELECT qid, q_emb, bucket AS pb FROM qb
           |  UNION ALL
           |  SELECT f.qid, qb.q_emb, xor(f.bucket, 1 << f.b) AS pb
           |  FROM flips f JOIN qb ON qb.qid = f.qid),
           |corpus AS (
           |  SELECT vec_id, embedding,
           |    ${bucketSql(bucketPlanes, "embedding")} AS bucket
           |  FROM embeddings),
           |cand AS (
           |  SELECT p.qid AS query_id, c.vec_id AS neighbor_id,
           |         ${cosineSql("p.q_emb", "c.embedding")} AS c
           |  FROM probes p JOIN corpus c ON c.bucket = p.pb
           |  WHERE c.vec_id <> p.qid)
           |SELECT query_id, neighbor_id, round(c, 4) AS cosine,
           |  row_number() OVER (PARTITION BY query_id
           |    ORDER BY c DESC, neighbor_id) AS rank
           |FROM cand QUALIFY rank <= 10
           |ORDER BY query_id, rank""".stripMargin
      }) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      SignLSH.multiprobeTopK(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nprobe = 4, bucketPlanes)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Hamming-2 multi-probe: perturbations drawn from singles AND
    // margin-pair-ranked double flips — recall keeps climbing after
    // the Hamming-1 ball saturates (§9.13), still one stored table.
    GraftQuery(
      "v19_multiprobe_h2", {
        val dotsList = bucketPlanes.map(p => dotPlaneSql(p, "q.embedding"))
          .mkString("[\n    ", ",\n    ", "\n  ]")
        val bucketFromDots = (0 until 8)
          .map(b => s"(CASE WHEN dots[${b + 1}] >= 0 THEN ${1 << b} ELSE 0 END)")
          .mkString(" + ")
        s"""WITH qd AS (
           |  SELECT q.vec_id AS qid, q.embedding AS q_emb, $dotsList AS dots
           |  FROM embeddings q WHERE q.vec_id < 5),
           |qb AS (SELECT qid, q_emb, dots, $bucketFromDots AS bucket FROM qd),
           |bits AS (
           |  SELECT qid, bucket, t.b, abs(dots[t.b + 1]) AS m
           |  FROM qb CROSS JOIN range(0, 8) t(b)),
           |pert AS (
           |  SELECT qid, bucket, s, mask,
           |    row_number() OVER (PARTITION BY qid ORDER BY s, mask) AS rn
           |  FROM (
           |    SELECT qid, bucket, m AS s, (1 << b) AS mask FROM bits
           |    UNION ALL
           |    SELECT x.qid, x.bucket, x.m + y.m AS s,
           |           (1 << x.b) | (1 << y.b) AS mask
           |    FROM bits x JOIN bits y ON x.qid = y.qid AND x.b < y.b)),
           |probes AS (
           |  SELECT qid, q_emb, bucket AS pb FROM qb
           |  UNION ALL
           |  SELECT p.qid, qb.q_emb, xor(p.bucket, p.mask) AS pb
           |  FROM pert p JOIN qb ON qb.qid = p.qid WHERE p.rn <= 11),
           |corpus AS (
           |  SELECT vec_id, embedding,
           |    ${bucketSql(bucketPlanes, "embedding")} AS bucket
           |  FROM embeddings),
           |cand AS (
           |  SELECT p.qid AS query_id, c.vec_id AS neighbor_id,
           |         ${cosineSql("p.q_emb", "c.embedding")} AS c
           |  FROM probes p JOIN corpus c ON c.bucket = p.pb
           |  WHERE c.vec_id <> p.qid)
           |SELECT query_id, neighbor_id, round(c, 4) AS cosine,
           |  row_number() OVER (PARTITION BY query_id
           |    ORDER BY c DESC, neighbor_id) AS rank
           |FROM cand QUALIFY rank <= 10
           |ORDER BY query_id, rank""".stripMargin
      }) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      SignLSH.multiprobeTopK(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nprobe = 12, bucketPlanes,
          maxFlips = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // JL random-projection prefilter: candidates ranked by cosine in
    // a seeded ±1 16-dim projection (4x fewer multiply-adds per pair
    // than the 64-dim space), top-30 per query rescored exactly. The
    // dense-reduction ANN rung — the projection preserves a usable
    // distance, so the prefilter degrades gracefully rather than
    // missing buckets. Oracle inlines the same literal planes.
    GraftQuery(
      "v21_rp_prefilter", {
        val projC = rpPlanes.map(p => dotPlaneSql(p, "embedding"))
          .mkString("list_value(\n    ", ",\n    ", ")")
        s"""WITH cp AS (
           |  SELECT vec_id, embedding, $projC AS proj FROM embeddings),
           |qp AS (SELECT vec_id AS query_id, embedding AS q_emb,
           |         proj AS q_proj
           |       FROM cp WHERE vec_id < 5),
           |s1 AS (SELECT q.query_id, c.vec_id AS neighbor_id,
           |         c.embedding AS c_emb, q.q_emb,
           |         ${cosineSql("q.q_proj", "c.proj")} AS pcos
           |       FROM cp c JOIN qp q ON c.vec_id <> q.query_id),
           |r1 AS (SELECT * FROM (
           |         SELECT *, row_number() OVER (PARTITION BY query_id
           |           ORDER BY pcos DESC, neighbor_id) AS rk1 FROM s1)
           |       WHERE rk1 <= 30)
           |SELECT query_id, neighbor_id,
           |  round(${cosineSql("q_emb", "c_emb")}, 4) AS cosine,
           |  row_number() OVER (PARTITION BY query_id
           |    ORDER BY ${cosineSql("q_emb", "c_emb")} DESC, neighbor_id)
           |    AS rank
           |FROM r1 QUALIFY rank <= 10
           |ORDER BY query_id, rank""".stripMargin
      }) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      graft.similarity.RandomProjection.prefilterTopK(
        e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
        rpPlanes, prefilterK = 30, k = 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // MMR diversified re-rank: the distributed pass is the pool
    // retrieval (v1's brute-force top-k); the greedy selection runs
    // over the constant-size pool — selectK argmax jobs, each one
    // cross join against <= selectK picked rows. The oracle unrolls
    // the same greedy chain; cosines are the bit-exact fold, so every
    // argmax resolves identically.
    GraftQuery("v20_mmr_rerank", mmrOracleSql(poolK = 20, selectK = 5)) {
      (s, dir) =>
        val e = Tables.load(s, dir, "embeddings")
        graft.similarity.MmrRerank.rerank(
          e, e.filter(col("vec_id") === 0), "vec_id", "embedding",
          poolK = 20, selectK = 5, lambda = 0.7, mu = 0.3)
          .orderBy("rank")
    },

    // Text-native retrieval over the t27 hashed TF-IDF features:
    // cosine top-k served by a postings (bucket) join — the sparse
    // inverted-index plan, corpus never shuffled (query side
    // broadcast). Query fleet = every doc_id % 50 == 0 (100 queries
    // at sf0.1). Features, norms, ceilings, AND the adaptive gates'
    // stats all serve from the TfIdfStore artifact — a query fleet
    // runs zero corpus-sized jobs before its retrieval joins (the r9
    // bench regression was exactly this scaffolding recomputed per
    // run).
    GraftQuery(
      "v22_tfidf_knn",
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS tok
         |  FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |nd AS (SELECT count(*) * 1.0 AS n_docs FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS bucket,
         |    round(sum((CASE WHEN ('0x' || substr(md5(tok), 16, 1))::BIGINT < 8
         |               THEN 1.0 ELSE -1.0 END)
         |          * tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0)), 4) AS w
         |  FROM tf JOIN dfreq USING (tok) CROSS JOIN nd GROUP BY 1, 2),
         |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM f GROUP BY doc_id),
         |qf AS (SELECT doc_id AS query_id, bucket, w AS qw FROM f
         |       WHERE doc_id % 50 = 0),
         |qn AS (SELECT doc_id AS query_id, nrm AS qnrm FROM nrm
         |       WHERE doc_id % 50 = 0),
         |dots AS (SELECT query_id, doc_id, sum(w * qw) AS dot
         |  FROM f JOIN qf USING (bucket)
         |  WHERE query_id <> doc_id GROUP BY 1, 2),
         |sc AS (SELECT query_id, doc_id,
         |    round(dot / (nrm * qnrm), 4) AS cosine
         |  FROM dots JOIN nrm USING (doc_id) JOIN qn USING (query_id))
         |SELECT query_id, doc_id, cosine,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, doc_id) AS rank
         |FROM sc QUALIFY rank <= 5
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      import graft.functions.{HashedTfIdf, TfIdfStore}
      val f = TfIdfStore.features(s, dir)
      val qf = f.where(col("doc_id") % 50 === 0)
        .withColumnRenamed("doc_id", "query_id")
      // MAX-SCORE pruned retrieval — the oracle is the naive
      // score-everything form over a FRESH vectorization, so oracle
      // equality proves both the pruning losslessness AND that the
      // stored features match the inline build bit-for-bit
      HashedTfIdf.topKCosinePrunedStored(f, qf, k = 5,
          norms = TfIdfStore.norms(s, dir),
          ceilings = TfIdfStore.ceilings(s, dir),
          stats = TfIdfStore.stats(s, dir))
        .select("query_id", "doc_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    }
  )

  /** DuckDB unroll of MmrRerank's greedy chain: candidate pool by
    * relevance, then per step r the remaining-candidate scores
    * `0.7 * rel - 0.3 * max(cos to picked)` and the (score DESC, id)
    * argmax — same literals, same associativity, same tiebreaks as
    * the Spark side.
    */
  private def mmrOracleSql(poolK: Int, selectK: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
       |cand AS (
       |  SELECT v.vec_id, v.embedding,
       |    ${cosineSql("v.embedding", "q.embedding")} AS rel
       |  FROM embeddings v, q WHERE v.vec_id <> 0
       |  ORDER BY rel DESC, v.vec_id LIMIT $poolK),
       |m1 AS (SELECT 1 AS rank, vec_id, embedding,
       |    0.7 * rel - 0.3 * 0.0 AS score
       |  FROM cand ORDER BY score DESC, vec_id LIMIT 1),
       |sel1 AS (SELECT vec_id, embedding FROM m1)""".stripMargin
    for (r <- 2 to selectK) sb ++= s""",
       |m$r AS (SELECT $r AS rank, c.vec_id, c.embedding,
       |    0.7 * c.rel - 0.3 * max(${cosineSql("c.embedding", "s.embedding")})
       |      AS score
       |  FROM cand c CROSS JOIN sel${r - 1} s
       |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
       |  GROUP BY c.vec_id, c.embedding, c.rel
       |  ORDER BY score DESC, c.vec_id LIMIT 1),
       |sel$r AS (SELECT vec_id, embedding FROM sel${r - 1}
       |  UNION ALL SELECT vec_id, embedding FROM m$r)""".stripMargin
    sb ++= s"""
       |SELECT rank, vec_id, round(score, 4) AS score FROM (
       |  ${(1 to selectK).map(r => s"SELECT rank, vec_id, score FROM m$r")
           .mkString("\n  UNION ALL ")}) mm
       |ORDER BY rank""".stripMargin
    sb.toString
  }
}
