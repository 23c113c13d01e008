package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dedup.{BandStore, BloomDedup, ClusterStore, Decontam, DigestStore, DupClusters, ExactDedup, GramStore, IngestScreen, MinHashLSH, Shingles, SimHash}
import graft.functions.TextFunctions

/** Deduplication queries over `documents`: exact content hashing,
  * MinHash signatures, banded-LSH candidate generation, exact n-gram
  * Jaccard refinement, and SimHash. The oracle SQL re-derives the
  * same md5-based arithmetic with DuckDB list comprehensions, so the
  * hash-compare is bit-exact.
  */
object DedupQueries {

  private val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val K = MinHashLSH.defaultK
  private val B = MinHashLSH.defaultBands
  private val R = K / B

  /** shingle-list CTE shared by the minhash oracles. */
  private val shinglesCte =
    s"""WITH s AS (
       |  SELECT doc_id,
       |    [substring(norm, i, 5) for i in generate_series(1, greatest(length(norm) - 4, 1))]
       |      AS shingles
       |  FROM (SELECT doc_id, $norm AS norm FROM documents))""".stripMargin

  // Same universal hash family as MinHashLSH: one md5 per shingle,
  // two 60-bit bases (hex [1,15] and [16,30]), k seeded
  // (a*x1 + b*x2 + c) mod p with per-product reduction.
  private val P = MinHashLSH.P
  private val sigElems: String = (0 until K).map { s =>
    val (a, b, c) = MinHashLSH.hashParams(s)
    s"""list_min([($a * (('0x' || substr(md5(sh), 1, 15))::BIGINT % $P) % $P
       |      + $b * (('0x' || substr(md5(sh), 16, 15))::BIGINT % $P) % $P
       |      + $c) % $P for sh in shingles])""".stripMargin
  }.mkString(",\n    ")

  private val sigCte =
    s"""$shinglesCte, sig AS (
       |  SELECT doc_id, [
       |    $sigElems] AS sig
       |  FROM s)""".stripMargin

  private val bandCte = {
    val slice = (1 to R).map(i => s"sig[$R * b + $i]").mkString(", ")
    s"""$sigCte, bands AS (
       |  SELECT doc_id, b, concat_ws('|', $slice) AS bucket
       |  FROM sig CROSS JOIN range(0, $B) t(b))""".stripMargin
  }

  private val candidatesSql =
    s"""SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
       |  FROM bands a JOIN bands c
       |    ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id""".stripMargin

  // SimHash oracle pieces: 32 per-bit sums over md5's first 8 hex chars.
  private val simhashBitSums: String = (0 until 32).map { p =>
    val j = p / 4 + 1
    val b = 1 << (p % 4)
    s"sum(((instr('0123456789abcdef', substring(hx, $j, 1)) - 1) // $b) % 2) AS b$p"
  }.mkString(",\n    ")

  private val simhashPack: String = (0 until 32)
    .map(p => s"CASE WHEN b$p * 2 > n THEN ${1L << p} ELSE 0 END")
    .mkString(" + ")

  private val simhashCte =
    s"""WITH toks AS (
       |  SELECT doc_id, md5(unnest(string_split(norm, ' '))) AS hx
       |  FROM (SELECT doc_id, $norm AS norm FROM documents)),
       |bits AS (
       |  SELECT doc_id, count(*) AS n,
       |    $simhashBitSums
       |  FROM toks GROUP BY doc_id),
       |sh AS (SELECT doc_id, $simhashPack AS simhash FROM bits)""".stripMargin

  /** 64-bit simhash CTE (16 md5 hex chars; bit 63's power is Long.Min,
    * added LAST so every partial sum stays in BIGINT range).
    */
  private val simhash64Cte = {
    val bitSums = (0 until 64).map { p =>
      val j = p / 4 + 1
      val b = 1 << (p % 4)
      s"sum(((instr('0123456789abcdef', substring(hx, $j, 1)) - 1) // $b) % 2) AS b$p"
    }.mkString(",\n    ")
    val pack = (0 until 64)
      .map(p => s"CASE WHEN b$p * 2 > n THEN ${1L << p} ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, md5(unnest(string_split(norm, ' '))) AS hx
       |  FROM (SELECT doc_id, $norm AS norm FROM documents)),
       |bits AS (
       |  SELECT doc_id, count(*) AS n,
       |    $bitSums
       |  FROM toks GROUP BY doc_id),
       |sh AS (SELECT doc_id, $pack AS simhash FROM bits)""".stripMargin
  }

  /** Recursive-CTE oracle shared by d9 (label propagation) and d13
    * (star contraction) — both must produce this exact labelling.
    */
  private val dupClustersCtes =
    s"""${simhashCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |pairs AS (
       |  SELECT a.doc_id AS id_a, c.doc_id AS id_b
       |  FROM sh a JOIN sh c
       |    ON (a.simhash // 65536) = (c.simhash // 65536) AND a.doc_id < c.doc_id
       |  WHERE bit_count(xor(a.simhash::BIGINT, c.simhash::BIGINT)) <= 6),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |cc AS (
       |  SELECT doc_id AS id, doc_id AS lbl FROM documents
       |  UNION
       |  SELECT e.dst AS id, cc.lbl
       |  FROM cc JOIN edges e ON cc.id = e.src)""".stripMargin

  private val dupClustersOracle =
    s"""$dupClustersCtes
       |SELECT id AS doc_id, min(lbl) AS cluster_id
       |FROM cc GROUP BY id ORDER BY doc_id""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    // Exact dedup groups: one survivor (min id) per identical
    // normalized content, with multiplicity.
    GraftQuery(
      "d1_exact_dedup",
      s"""SELECT md5(norm) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
         |FROM (SELECT doc_id, $norm AS norm FROM documents)
         |GROUP BY 1 ORDER BY fp""".stripMargin) { (s, dir) =>
      ExactDedup.groups(Tables.load(s, dir, "documents"), "doc_id", col("text"))
        .orderBy("fp")
    },

    // MinHash signatures (k seeded min-hashes, string-joined so the
    // cross-engine compare avoids array-column semantics).
    GraftQuery(
      "d2_minhash_sig",
      s"""$sigCte
         |SELECT doc_id, array_to_string(sig, ',') AS sig_str
         |FROM sig ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      MinHashLSH.signatureTable(d, "doc_id", TextFunctions.normalize(col("text")))
        .select(col("doc_id"),
          concat_ws(",", (0 until K).map(i => col(s"h$i")): _*).as("sig_str"))
        .orderBy("doc_id")
    },

    // LSH candidate pairs: collide in >= 1 of the banded buckets.
    GraftQuery(
      "d3_lsh_candidates",
      s"""$bandCte
         |$candidatesSql
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      MinHashLSH.candidatePairs(d, "doc_id", TextFunctions.normalize(col("text")))
        .orderBy("id_a", "id_b")
    },

    // Exact 5-gram Jaccard refinement over the LSH candidates only —
    // the scale path: O(candidates), never O(n^2).
    GraftQuery(
      "d4_jaccard_pairs",
      s"""$bandCte, cand AS (
         |$candidatesSql),
         |sets AS (
         |  SELECT doc_id, list_distinct(shingles) AS sh FROM s)
         |SELECT id_a, id_b,
         |  round(len(list_filter(a.sh, x -> list_contains(c.sh, x))) * 1.0 /
         |    (len(a.sh) + len(c.sh) - len(list_filter(a.sh, x -> list_contains(c.sh, x)))), 4)
         |    AS jaccard
         |FROM cand JOIN sets a ON cand.id_a = a.doc_id
         |          JOIN sets c ON cand.id_b = c.doc_id
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      MinHashLSH.nearDuplicates(d, "doc_id", col("text"), threshold = 0.0)
        .orderBy("id_a", "id_b")
    },

    // SimHash signature per document.
    GraftQuery(
      "d5_simhash",
      s"""$simhashCte
         |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      SimHash.compute(d, "doc_id", TextFunctions.normalize(col("text")))
        .orderBy("doc_id")
    },

    // SimHash near-pairs: same top-16-bit block, Hamming <= 6.
    GraftQuery(
      "d6_simhash_pairs",
      s"""$simhashCte
         |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
         |  bit_count(xor(a.simhash::BIGINT, c.simhash::BIGINT)) AS hamming
         |FROM sh a JOIN sh c
         |  ON (a.simhash // 65536) = (c.simhash // 65536) AND a.doc_id < c.doc_id
         |WHERE bit_count(xor(a.simhash::BIGINT, c.simhash::BIGINT)) <= 6
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val sims = SimHash.compute(d, "doc_id", TextFunctions.normalize(col("text")))
      SimHash.nearPairs(sims, "doc_id", maxDist = 6)
        .orderBy("id_a", "id_b")
    },

    // SimHash near-pairs with GUARANTEED recall: pigeonhole 4x8-bit
    // block index — Hamming <= 3 implies one block matches exactly, so
    // every qualifying pair is found (d6 is the cheap single-block
    // heuristic; this is the exhaustive form).
    GraftQuery(
      "d7_simhash_blocked",
      s"""$simhashCte,
         |idx AS (
         |  SELECT doc_id, simhash, t.b AS blk_i,
         |         (simhash >> (8 * t.b)) & 255 AS blk_v
         |  FROM sh CROSS JOIN range(0, 4) t(b))
         |SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |  bit_count(xor(a.simhash::BIGINT, c.simhash::BIGINT)) AS hamming
         |FROM idx a JOIN idx c
         |  ON a.blk_i = c.blk_i AND a.blk_v = c.blk_v AND a.doc_id < c.doc_id
         |WHERE bit_count(xor(a.simhash::BIGINT, c.simhash::BIGINT)) <= 3
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val sims = SimHash.compute(d, "doc_id", TextFunctions.normalize(col("text")))
      SimHash.nearPairsBlocked(sims, "doc_id", maxDist = 3, blocks = 4)
        .orderBy("id_a", "id_b")
    },

    // SimHash at the ≥10⁶-doc width: 64-bit hash, 2×32-bit pigeonhole
    // blocks, Hamming ≤ 1. d7's 16-bit blocks hit their pigeonhole
    // limit at 10⁶ docs (2¹⁶ bucket values < n ⇒ candidate volume
    // n²·blocks/2^width blows past the formula — SURVEY §9.5); 32-bit
    // blocks keep expected occupancy n/2³² ≪ 1 so candidates stay
    // ~linear in the true near-dup count at 10⁶⁺ docs. Same guaranteed
    // recall by construction: Hamming ≤ 1 < 2 blocks ⇒ one block
    // matches exactly.
    GraftQuery(
      "d17_simhash_wide",
      s"""$simhash64Cte,
         |idx AS (
         |  SELECT doc_id, simhash, t.b AS blk_i,
         |         (simhash >> (32 * t.b)) & 4294967295 AS blk_v
         |  FROM sh CROSS JOIN range(0, 2) t(b))
         |SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |  bit_count(xor(a.simhash::BIGINT, c.simhash::BIGINT)) AS hamming
         |FROM idx a JOIN idx c
         |  ON a.blk_i = c.blk_i AND a.blk_v = c.blk_v AND a.doc_id < c.doc_id
         |WHERE bit_count(xor(a.simhash::BIGINT, c.simhash::BIGINT)) <= 1
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val sims = SimHash.compute(d, "doc_id", TextFunctions.normalize(col("text")),
        bits = 64)
      SimHash.nearPairsBlocked(sims, "doc_id", maxDist = 1, blocks = 2, bits = 64)
        .orderBy("id_a", "id_b")
    },

    // Incremental dedup: a NEW batch (doc_id >= 250) anti-joined by
    // content fingerprint against the already-ingested corpus
    // (doc_id < 250) — the per-increment shape of a production
    // pipeline, where the seen-set is a fingerprint table, never the
    // full corpus text. The anti-join key is the md5 fingerprint: at
    // scale the seen side is a compact sorted/bucketed digest table.
    GraftQuery(
      "d8_incremental_dedup",
      s"""WITH f AS (SELECT doc_id, md5($norm) AS fp FROM documents)
         |SELECT n.doc_id, n.fp
         |FROM (SELECT * FROM f WHERE doc_id >= 250) n
         |ANTI JOIN (SELECT * FROM f WHERE doc_id < 250) seen
         |  ON n.fp = seen.fp
         |ORDER BY n.doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.fingerprint(TextFunctions.normalize(col("text"))).as("fp"))
      d.filter(col("doc_id") >= 250)
        .join(d.filter(col("doc_id") < 250).select("fp"), Seq("fp"), "left_anti")
        .select("doc_id", "fp")
        .orderBy("doc_id")
    },

    // Incremental LSH probe: the NEW batch (doc_id >= 250) banded and
    // equi-joined against the STORED corpus index (doc_id < 250) —
    // near-dup candidates per increment without re-deriving old x old
    // pairs or re-reading stored text (the d8 discipline, LSH form).
    GraftQuery(
      "d10_incremental_lsh",
      s"""$bandCte
         |SELECT DISTINCT a.doc_id AS id_index, c.doc_id AS id_probe
         |FROM bands a JOIN bands c
         |  ON a.b = c.b AND a.bucket = c.bucket
         | AND a.doc_id < 250 AND c.doc_id >= 250
         |ORDER BY id_index, id_probe""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val norm = TextFunctions.normalize(col("text"))
      val index = MinHashLSH.bandedIndex(d.filter(col("doc_id") < 250), "doc_id", norm)
      MinHashLSH.probeCandidates(index, d.filter(col("doc_id") >= 250), "doc_id", norm)
        .orderBy("id_index", "id_probe")
    },

    // The same probe against the PERSISTED band index (BandStore,
    // maintained O(new) per corpus increment — banding is per-doc
    // deterministic, so stored ≡ inline and d10's oracle transfers):
    // an ingest batch screens for near-dups without re-shingling one
    // byte of corpus text. Near-dup counterpart of d11's stored
    // fingerprint screen.
    GraftQuery(
      "d20_stored_band_probe",
      s"""$bandCte
         |SELECT DISTINCT a.doc_id AS id_index, c.doc_id AS id_probe
         |FROM bands a JOIN bands c
         |  ON a.b = c.b AND a.bucket = c.bucket
         | AND a.doc_id < 250 AND c.doc_id >= 250
         |ORDER BY id_index, id_probe""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val index = BandStore.bands(s, dir, "documents")
        .filter(col("doc_id") < 250)
      MinHashLSH.probeCandidates(index, d.filter(col("doc_id") >= 250),
          "doc_id", TextFunctions.normalize(col("text")))
        .orderBy("id_index", "id_probe")
    },

    // The composed per-batch INGEST SCREEN — the one call a production
    // pipeline makes per incoming batch: split into exact_dup (stored
    // fingerprint table), near_dup (stored band index, with witness
    // count), fresh. Both stored sides maintained O(new); corpus text
    // never re-read. Statuses and counts re-derived in full by the
    // oracle.
    GraftQuery(
      "d21_ingest_screen",
      s"""$bandCte,
         |f AS (SELECT doc_id, md5($norm) AS fp FROM documents),
         |ex AS (SELECT DISTINCT n.doc_id FROM f n JOIN f s
         |        ON n.fp = s.fp AND n.doc_id >= 250 AND s.doc_id < 250),
         |nw AS (SELECT c.doc_id, count(DISTINCT a.doc_id) AS n_near
         |       FROM bands a JOIN bands c
         |         ON a.b = c.b AND a.bucket = c.bucket
         |        AND a.doc_id < 250 AND c.doc_id >= 250
         |       GROUP BY c.doc_id)
         |SELECT d.doc_id,
         |  CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
         |       WHEN nw.doc_id IS NOT NULL THEN 'near_dup'
         |       ELSE 'fresh' END AS status,
         |  coalesce(nw.n_near, 0)::BIGINT AS n_near_witnesses
         |FROM (SELECT doc_id FROM documents WHERE doc_id >= 250) d
         |LEFT JOIN ex USING (doc_id)
         |LEFT JOIN nw ON d.doc_id = nw.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      IngestScreen.screen(s, dir, "documents",
          batch = d.filter(col("doc_id") >= 250), "doc_id",
          corpusFilter = col("doc_id") < 250)
        .orderBy("doc_id")
    },

    // Duplicate-cluster resolution: connected components over the d6
    // SimHash near-pairs. Every document gets the min doc_id reachable
    // through any chain of near-dup pairs as its cluster id; the
    // keep-one-per-cluster filter is then `doc_id = cluster_id`.
    // Oracle: recursive label propagation as a DuckDB recursive CTE
    // (min reachable id per node over the symmetrized edge list).
    GraftQuery(
      "d9_dup_clusters",
      dupClustersOracle) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val sims = SimHash.compute(d, "doc_id", TextFunctions.normalize(col("text")))
      val pairs = SimHash.nearPairs(sims, "doc_id", maxDist = 6)
      DupClusters.components(d, "doc_id", pairs, "id_a", "id_b")
        .orderBy("doc_id")
    },

    // Same clustering through the O(log n)-round alternating
    // large-star/small-star contraction — the physical path for
    // adversarially deep duplicate chains, where per-hop propagation
    // (d9) needs diameter-many rounds. Identical labelling, same
    // recursive-CTE oracle.
    GraftQuery(
      "d13_dup_clusters_star",
      dupClustersOracle) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val sims = SimHash.compute(d, "doc_id", TextFunctions.normalize(col("text")))
      val pairs = SimHash.nearPairs(sims, "doc_id", maxDist = 6)
      DupClusters.componentsAlternating(d, "doc_id", pairs, "id_a", "id_b")
        .orderBy("doc_id")
    },

    // Same clustering once more through IDENTICAL-SIGNATURE
    // CONTRACTION — the duplication-heavy-corpus path (§9.11: the
    // uncontracted build's pair volume is quadratic in duplication
    // width per bucket): one representative per distinct simhash runs
    // the pair search and the star contraction, every document then
    // inherits its signature's label. Exactly the d9/d13 labelling
    // (the pair predicate is signature-pure, so components correspond
    // 1:1 and group minima are preserved), same recursive-CTE oracle.
    GraftQuery(
      "d19_cluster_contracted",
      dupClustersOracle) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val sims = SimHash.compute(d, "doc_id", TextFunctions.normalize(col("text")))
      DupClusters.componentsContracted(d, "doc_id", sims, "simhash",
        reps => SimHash.nearPairs(reps, "doc_id", maxDist = 6))
        .orderBy("doc_id")
    },

    // Quality-aware survivor selection: per duplicate cluster keep the
    // HIGHEST-t2-quality member (ties to the lowest id) — the keep
    // rule production pipelines actually use, replacing d9/d13's
    // lowest-id convention. BOTH inputs come from persisted stores:
    // clusters from ClusterStore and scores from QualityStore (each a
    // once-per-ingest job, bit-identical to inline by determinism;
    // d9/d13 and t2 keep benching the computations themselves) — the
    // query itself reads two narrow tables and never rescans corpus
    // text; both window passes share one cluster_id exchange.
    GraftQuery(
      "d18_quality_keep",
      s"""$dupClustersCtes,
         |cl AS (SELECT id AS doc_id, min(lbl) AS cluster_id
         |       FROM cc GROUP BY id),
         |${TextQueries.qualityCte},
         |r AS (
         |  SELECT cl.cluster_id, cl.doc_id, q.quality,
         |    row_number() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY q.quality DESC, cl.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY cl.cluster_id) AS n_members
         |  FROM cl JOIN qual q ON cl.doc_id = q.doc_id)
         |SELECT cluster_id, doc_id AS keep_id, quality, n_members
         |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin) { (s, dir) =>
      val clusters = ClusterStore.clusters(s, dir, "documents", maxDist = 6)
      val quality = graft.functions.QualityStore.scores(s, dir, "documents")
      DupClusters.keepBest(clusters, quality, "doc_id", "quality")
        .orderBy("cluster_id")
    },

    // Provenance-priority keep: a curated source tier beats per-doc
    // quality, quality breaks ties inside a tier — the licensing-aware
    // keep rule (d18 with an explicit preference ordering). Same
    // stored clusters + stored quality scores; priority is a literal
    // tier map over the source column.
    GraftQuery(
      "d22_priority_keep",
      s"""$dupClustersCtes,
         |cl AS (SELECT id AS doc_id, min(lbl) AS cluster_id
         |       FROM cc GROUP BY id),
         |${TextQueries.qualityCte},
         |pr AS (
         |  SELECT doc_id, source,
         |    CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 2
         |         WHEN CAST(substr(source, 4) AS INT) < 10 THEN 1
         |         ELSE 0 END AS priority
         |  FROM documents),
         |r AS (
         |  SELECT cl.cluster_id, cl.doc_id, pr.source, pr.priority, q.quality,
         |    row_number() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY pr.priority DESC, q.quality DESC, cl.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY cl.cluster_id) AS n_members
         |  FROM cl JOIN qual q ON cl.doc_id = q.doc_id
         |          JOIN pr ON cl.doc_id = pr.doc_id)
         |SELECT cluster_id, doc_id AS keep_id, source, priority, quality,
         |       n_members
         |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin) { (s, dir) =>
      val clusters = ClusterStore.clusters(s, dir, "documents", maxDist = 6)
      val quality = graft.functions.QualityStore.scores(s, dir, "documents")
      val srcNum = substring(col("source"), 4, 10).cast("int")
      val attrs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          when(srcNum < 5, 2).when(srcNum < 10, 1).otherwise(0).as("priority"))
        .join(quality, "doc_id")
      DupClusters.keepPreferred(clusters, attrs, "doc_id",
          Seq(col("priority").desc, col("quality").desc, col("doc_id")),
          Seq("source", "priority", "quality"))
        .orderBy("cluster_id")
    },

    // Bloom-prefiltered incremental dedup — d8's semantics on the
    // 100 TB physical path: a driver-built Bloom filter over the seen
    // fingerprints splits the batch so only maybe-seen rows (dups +
    // ~1% false positives) pay the exact anti-join; definite-new rows
    // never shuffle. Result is EXACTLY the anti-join's (no false
    // negatives; positives refined away), so the oracle is d8's.
    // The seen side reads the STORED fingerprint table (DigestStore,
    // maintained O(new) per corpus increment — per-doc md5 is
    // deterministic, so stored ≡ inline), not a per-batch corpus
    // rescan; the incoming batch is fingerprinted inline as it must
    // be.
    GraftQuery(
      "d11_bloom_dedup",
      s"""WITH f AS (SELECT doc_id, md5($norm) AS fp FROM documents)
         |SELECT n.doc_id, n.fp
         |FROM (SELECT * FROM f WHERE doc_id >= 250) n
         |ANTI JOIN (SELECT * FROM f WHERE doc_id < 250) seen
         |  ON n.fp = seen.fp
         |ORDER BY n.doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.fingerprint(TextFunctions.normalize(col("text"))).as("fp"))
      BloomDedup.newRows(
          batch = d.filter(col("doc_id") >= 250),
          seen = DigestStore.digests(s, dir, "documents")
            .filter(col("doc_id") < 250),
          fpCol = "fp", expectedItems = 10000)
        .select("doc_id", "fp")
        .orderBy("doc_id")
    },

    // Benchmark decontamination (GPT-3/Pile-style): word-5-gram
    // overlap of the "benchmark" slice (doc_id >= 450) against the
    // training corpus — the leak check a corpus runs before shipping.
    // Exact-dup leaks score ratio ~1; fresh text ~0 at n=5 here.
    // The corpus side reads the STORED per-doc gram table (GramStore,
    // maintained O(new) per corpus increment — gram extraction is
    // per-doc deterministic, so stored ≡ inline): every release/eval
    // check filters the stored table instead of re-deriving 100 TB of
    // corpus grams.
    GraftQuery(
      "d12_decontamination",
      s"""WITH t AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(a[i : i + 4], ' ')
         |     for i in generate_series(1, len(a) - 4)]) AS grams
         |  FROM (SELECT doc_id, string_split($norm, ' ') AS a FROM documents)),
         |g AS (SELECT doc_id, unnest(grams) AS gram FROM t),
         |bench AS (SELECT doc_id, gram FROM g WHERE doc_id >= 450),
         |corpus AS (SELECT DISTINCT gram FROM g WHERE doc_id < 450),
         |hit AS (
         |  SELECT b.doc_id, count(*) AS n_hit
         |  FROM bench b JOIN corpus c USING (gram) GROUP BY b.doc_id),
         |-- totals from the ARRAY so zero-gram (short) docs keep a row,
         |-- mirroring the operator's pre-explode size()
         |tot AS (SELECT doc_id, len(grams) AS n_grams FROM t WHERE doc_id >= 450)
         |SELECT t.doc_id, t.n_grams,
         |  coalesce(h.n_hit, 0) AS n_hit,
         |  round(coalesce(h.n_hit, 0) / greatest(t.n_grams, 1), 4) AS contam_ratio,
         |  coalesce(h.n_hit, 0) > 0 AS is_contaminated
         |FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
         |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      Decontam.reportAgainstGrams(
          bench = d.filter(col("doc_id") >= 450),
          corpusGrams = GramStore.grams(s, dir, "documents", n = 5)
            .filter(col("doc_id") < 450),
          idCol = "doc_id",
          normCol = TextFunctions.normalize(col("text")), n = 5)
        .orderBy("doc_id")
    },

    // Cross-document duplicated-SPAN stats (ExactSubstr-lite): every
    // overlapping 8-token span keyed corpus-wide, earliest (doc, pos)
    // occurrence keeps it, the rest are duplicates — verbatim-passage
    // dedup (boilerplate, quotes) that document- and near-dup-level
    // passes can't see. One span-keyed shuffle; occurrence order is a
    // single packed long.
    GraftQuery(
      "d14_span_dedup",
      s"""WITH n AS (SELECT doc_id, $norm AS norm FROM documents),
         |tk AS (SELECT doc_id, string_split(norm, ' ') AS a FROM n),
         |off AS (SELECT doc_id, a,
         |          unnest(generate_series(1, greatest(len(a) - 7, 1))) AS p
         |        FROM tk),
         |sp AS (SELECT doc_id, array_to_string(a[p : p + 7], ' ') AS span,
         |          doc_id * 1048576 + p AS occ FROM off),
         |k AS (SELECT doc_id, occ, min(occ) OVER (PARTITION BY span) AS keep
         |      FROM sp)
         |SELECT doc_id, count(*) AS n_spans,
         |  sum(CASE WHEN occ <> keep THEN 1 ELSE 0 END)::BIGINT AS dup_spans,
         |  round(sum(CASE WHEN occ <> keep THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
         |    AS dup_ratio
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.dedup.SpanDedup.spanStats(
          Tables.load(s, dir, "documents"), "doc_id", col("text"), n = 8)
        .orderBy("doc_id")
    },

    // Variable-length span dedup: adjacent duplicated 8-spans merged
    // into MAXIMAL duplicated runs per doc (gaps-and-islands over the
    // dup-span starts) — the region list an ExactSubstr cut pass
    // consumes (Lee et al.), where d14 only reports volumes. The
    // engine shuffles hashed span keys (hashSpans default); the
    // oracle re-derives the same runs from span strings — outputs are
    // positions and counts, so they hash-match regardless.
    GraftQuery(
      "d15_span_runs",
      s"""WITH n AS (SELECT doc_id, $norm AS norm FROM documents),
         |tk AS (SELECT doc_id, string_split(norm, ' ') AS a FROM n),
         |off AS (SELECT doc_id, a,
         |          unnest(generate_series(1, greatest(len(a) - 7, 1))) AS p
         |        FROM tk),
         |sp AS (SELECT doc_id, array_to_string(a[p : p + 7], ' ') AS span,
         |          p, doc_id * 1048576 + p AS occ FROM off),
         |k AS (SELECT doc_id, p, occ, min(occ) OVER (PARTITION BY span) AS keep
         |      FROM sp),
         |d AS (SELECT doc_id, p FROM k WHERE occ <> keep),
         |i AS (SELECT doc_id, p,
         |        p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
         |      FROM d)
         |SELECT doc_id, min(p) AS run_start, max(p) AS run_end,
         |  (max(p) - min(p) + 8)::BIGINT AS run_tokens,
         |  count(*) AS n_spans
         |FROM i GROUP BY doc_id, isl
         |ORDER BY doc_id, run_start""".stripMargin) { (s, dir) =>
      graft.dedup.SpanDedup.dupRuns(
          Tables.load(s, dir, "documents"), "doc_id", col("text"), n = 8)
        .orderBy("doc_id", "run_start")
    },

    // The CUT pass — final step of the ExactSubstr chain: re-emit
    // each document with its d15 runs removed (earliest occurrence
    // of every span survives corpus-wide). The rebuild is map-side:
    // a higher-order filter of the token array against the doc's own
    // run list, joined back doc-keyed — no token-level shuffle.
    GraftQuery(
      "d16_span_cut",
      s"""WITH n AS (SELECT doc_id, $norm AS norm FROM documents),
         |tk AS (SELECT doc_id, string_split(norm, ' ') AS a FROM n),
         |off AS (SELECT doc_id, a,
         |          unnest(generate_series(1, greatest(len(a) - 7, 1))) AS p
         |        FROM tk),
         |sp AS (SELECT doc_id, array_to_string(a[p : p + 7], ' ') AS span,
         |          p, doc_id * 1048576 + p AS occ FROM off),
         |k AS (SELECT doc_id, p, occ, min(occ) OVER (PARTITION BY span) AS keep
         |      FROM sp),
         |d AS (SELECT doc_id, p FROM k WHERE occ <> keep),
         |isl AS (SELECT doc_id, p,
         |          p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS g
         |        FROM d),
         |rn AS (SELECT doc_id, min(p) AS rs, max(p) + 7 AS re
         |       FROM isl GROUP BY doc_id, g),
         |rl AS (SELECT doc_id, list(struct_pack(rs := rs, re := re)) AS runs
         |       FROM rn GROUP BY doc_id),
         |j AS (SELECT tk.doc_id, tk.a, rl.runs FROM tk
         |      LEFT JOIN rl ON tk.doc_id = rl.doc_id),
         |cut AS (SELECT doc_id, a, CASE WHEN runs IS NULL THEN a ELSE
         |    [a[ii] for ii in generate_series(1, len(a))
         |     if len(list_filter(runs, r -> ii >= r.rs AND ii <= r.re)) = 0]
         |  END AS kept FROM j)
         |SELECT doc_id,
         |  coalesce(array_to_string(kept, ' '), '') AS text_dedup,
         |  len(a)::BIGINT AS n_tokens, (len(a) - len(kept))::BIGINT AS cut_tokens
         |FROM cut ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.dedup.SpanDedup.cutText(
          Tables.load(s, dir, "documents"), "doc_id", col("text"), n = 8)
        .orderBy("doc_id")
    },

    // EXACT set-similarity self-join (prefix filter, AllPairs/PPJoin
    // family): every word-Jaccard >= 0.9 pair, guaranteed — the exact
    // rung above d3/d4's probabilistic LSH. The ORACLE is deliberately
    // the naive all-pairs form: if the prefix filter ever lost a true
    // pair, this hash compare would catch it. Thresholds compare in
    // exact integer arithmetic (inter*10 >= 9*union) in both engines,
    // so no floating-point boundary pair can flip.
    GraftQuery(
      "d23_prefix_join",
      s"""WITH docs AS (
         |  SELECT doc_id, list_distinct(string_split($norm, ' ')) AS toks
         |  FROM documents)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(len(list_filter(a.toks, x -> list_contains(b.toks, x))) * 1.0 /
         |    (len(a.toks) + len(b.toks)
         |      - len(list_filter(a.toks, x -> list_contains(b.toks, x)))), 4)
         |    AS jaccard
         |FROM docs a JOIN docs b ON a.doc_id < b.doc_id
         |WHERE len(list_filter(a.toks, x -> list_contains(b.toks, x))) * 10 >=
         |  (len(a.toks) + len(b.toks)
         |    - len(list_filter(a.toks, x -> list_contains(b.toks, x)))) * 9
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      // STORE-SERVED (tokenization/df/sorting amortized into the
      // artifact; candidates + verify from stored pieces)
      graft.dedup.PrefixStore.similarPairs(s, dir, "documents",
          tauNum = 9, tauDen = 10)
        .orderBy("id_a", "id_b")
    },

    // EXACT ingest screening against the STORED prefix index: every
    // corpus doc with word-Jaccard >= 0.9 of a batch doc, guaranteed
    // (PrefixStore freezes the token order at build — any FIXED total
    // order preserves the prefix theorem, so staleness costs only
    // efficiency, never a pair). Oracle is the naive batch x corpus
    // join: a lost pair hash-mismatches.
    GraftQuery(
      "d24_prefix_screen",
      s"""WITH docs AS (
         |  SELECT doc_id, list_distinct(string_split($norm, ' ')) AS toks
         |  FROM documents)
         |SELECT b.doc_id AS new_id, a.doc_id AS dup_id,
         |  round(len(list_filter(a.toks, x -> list_contains(b.toks, x))) * 1.0 /
         |    (len(a.toks) + len(b.toks)
         |      - len(list_filter(a.toks, x -> list_contains(b.toks, x)))), 4)
         |    AS jaccard
         |FROM docs a JOIN docs b ON a.doc_id < 250 AND b.doc_id >= 250
         |WHERE len(list_filter(a.toks, x -> list_contains(b.toks, x))) * 10 >=
         |  (len(a.toks) + len(b.toks)
         |    - len(list_filter(a.toks, x -> list_contains(b.toks, x)))) * 9
         |ORDER BY new_id, dup_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      graft.dedup.PrefixStore.screen(s, dir, "documents",
          batch = d.filter(col("doc_id") >= 250), "doc_id",
          tauNum = 9, tauDen = 10, corpusFilter = col("doc_id") < 250)
        .orderBy("new_id", "dup_id")
    },

    // EXACT near-dup clusters: connected components over the d23
    // similarity graph — the deterministic keep-group resolution the
    // probabilistic d9/d13 clusters approximate. The CC iteration
    // runs on the CONTRACTED rep graph (28,865 edges stand in for
    // 964,854 at sf0.1); members inherit the rep label, which is the
    // cluster min because reps are group minima. Oracle: recursive
    // label propagation over the naive exact-pair edge list.
    GraftQuery(
      "d25_exact_clusters",
      s"""WITH RECURSIVE docs AS (
         |  SELECT doc_id, list_distinct(string_split($norm, ' ')) AS toks
         |  FROM documents),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
         |  WHERE len(list_filter(a.toks, x -> list_contains(b.toks, x))) * 10 >=
         |    (len(a.toks) + len(b.toks)
         |      - len(list_filter(a.toks, x -> list_contains(b.toks, x)))) * 9),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |cc AS (
         |  SELECT doc_id AS id, doc_id AS lbl FROM documents
         |  UNION
         |  SELECT e.dst AS id, cc.lbl
         |  FROM cc JOIN edges e ON cc.id = e.src)
         |SELECT id AS doc_id, min(lbl) AS cluster_id
         |FROM cc GROUP BY id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // STORE-SERVED: rep graph + CC from the stored pieces
      graft.dedup.PrefixStore.clusters(s, dir, "documents",
          tauNum = 9, tauDen = 10)
        .orderBy("doc_id")
    },

    // CONTAINMENT screen: |batch ∩ stored| / |batch| >= 0.9 — the
    // asymmetric dedup dimension (a new doc mostly contained in a
    // stored one) that symmetric Jaccard misses when the stored doc
    // is much larger. Exact via probe-side frozen-order prefixes
    // against stored full postings; naive oracle again.
    GraftQuery(
      "d26_containment_screen",
      s"""WITH docs AS (
         |  SELECT doc_id, list_distinct(string_split($norm, ' ')) AS toks
         |  FROM documents)
         |SELECT b.doc_id AS new_id, a.doc_id AS dup_id,
         |  round(len(list_filter(b.toks, x -> list_contains(a.toks, x))) * 1.0
         |    / len(b.toks), 4) AS containment
         |FROM docs a JOIN docs b ON a.doc_id < 250 AND b.doc_id >= 250
         |WHERE len(list_filter(b.toks, x -> list_contains(a.toks, x))) * 10 >=
         |  len(b.toks) * 9
         |ORDER BY new_id, dup_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      graft.dedup.PrefixStore.screenContainment(s, dir, "documents",
          batch = d.filter(col("doc_id") >= 250), "doc_id",
          tauNum = 9, tauDen = 10, corpusFilter = col("doc_id") < 250)
        .orderBy("new_id", "dup_id")
    },

    // EXACT edit-distance (Levenshtein <= 2) self-join — the
    // short-string dedup rung (names, titles, URLs) set-Jaccard is
    // blind to. PassJoin-style pigeonhole segment blocking +
    // contraction + codegen'd levenshtein verify (EditJoin). The
    // corpus derives from part names plus DETERMINISTIC planted
    // typos (5th char deleted), computed identically in both
    // dialects; the oracle is the naive all-pairs join, so a pair
    // lost by the blocking hash-mismatches.
    GraftQuery(
      "d27_edit_join",
      """WITH base AS (
        |  SELECT p_partkey AS sid, lower(p_name) AS s FROM part
        |  WHERE p_partkey % 4 = 0),
        |typos AS (SELECT -(sid + 1) AS sid,
        |            substr(s, 1, 4) || substr(s, 6) AS s
        |          FROM base WHERE sid % 5 = 0),
        |c AS (SELECT * FROM base UNION ALL SELECT * FROM typos)
        |SELECT a.sid AS id_a, b.sid AS id_b,
        |  levenshtein(a.s, b.s)::BIGINT AS dist
        |FROM c a JOIN c b ON a.sid < b.sid
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val base = Tables.load(s, dir, "part")
        .filter(col("p_partkey") % 4 === 0)
        .select(col("p_partkey").as("sid"), lower(col("p_name")).as("s"))
      // typo ids NEGATE (-(sid+1)): disjoint from p_partkey at EVERY
      // scale factor — an additive offset collides once keys outgrow it
      val typos = base.filter(col("sid") % 5 === 0)
        .select((-(col("sid") + 1)).as("sid"),
          concat(substring(col("s"), 1, 4),
            col("s").substr(lit(6), length(col("s")))).as("s"))
      graft.dedup.EditJoin.similarPairs(
          base.unionByName(typos), "sid", col("s"), k = 2)
        .orderBy("id_a", "id_b")
    },

    // STORED edit-distance ingest screen — the short-string rung of
    // the stored-screen family (digest/band/prefix/containment). The
    // artifact keeps segments AND probe substrings (both orientations
    // in length), all additive, O(new) per corpus append; the batch
    // joins the clustered dictionary and verifies with codegen
    // levenshtein. Naive batch x corpus oracle: a lost pair
    // hash-mismatches.
    GraftQuery(
      "d28_edit_screen",
      """WITH c AS (
        |  SELECT p_partkey AS sid, lower(p_name) AS s FROM part
        |  WHERE p_partkey % 4 = 0),
        |b AS (SELECT -(p_partkey + 1) AS sid,
        |        substr(lower(p_name), 1, 4) || substr(lower(p_name), 6) AS s
        |      FROM part WHERE p_partkey % 20 = 0)
        |SELECT b.sid AS new_id, c.sid AS dup_id,
        |  levenshtein(b.s, c.s)::BIGINT AS dist
        |FROM c JOIN b ON levenshtein(b.s, c.s) <= 2
        |ORDER BY new_id, dup_id""".stripMargin) { (s, dir) =>
      val pn = lower(col("p_name"))
      // batch ids negate (see d27): disjoint from p_partkey at any SF
      val batch = Tables.load(s, dir, "part")
        .filter(col("p_partkey") % 20 === 0)
        .select((-(col("p_partkey") + 1)).as("sid"),
          concat(substring(pn, 1, 4), pn.substr(lit(6), length(pn))).as("s"))
      graft.dedup.EditStore.screen(s, s"$dir/part.parquet", "pname",
          "p_partkey", pn, batch, "sid", col("s"), k = 2,
          corpusFilter = col("sid") % 4 === 0)
        .orderBy("new_id", "dup_id")
    },

    // STORED exact edit-distance clusters over the whole corpus —
    // the short-string d25: labels persist as a keyed-upsert piece
    // (EditStore mirrors PrefixStore's pairs/labels machinery; an
    // append relabels only touched clusters) and the serve is a
    // scan. Oracle: recursive closure over the naive levenshtein
    // pair graph.
    GraftQuery(
      "d29_edit_clusters",
      """WITH RECURSIVE c AS (
        |  SELECT p_partkey AS sid, lower(p_name) AS s FROM part),
        |pairs AS (
        |  SELECT a.sid AS id_a, b.sid AS id_b
        |  FROM c a JOIN c b ON a.sid < b.sid
        |  WHERE levenshtein(a.s, b.s) <= 2),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |cc AS (
        |  SELECT sid AS id, sid AS lbl FROM c
        |  UNION
        |  SELECT e.dst AS id, cc.lbl
        |  FROM cc JOIN edges e ON cc.id = e.src)
        |SELECT id AS sid, min(lbl) AS cluster_id
        |FROM cc GROUP BY id ORDER BY sid""".stripMargin) { (s, dir) =>
      graft.dedup.EditStore.clusters(s, s"$dir/part.parquet", "pname",
          "p_partkey", lower(col("p_name")), k = 2)
        .orderBy("sid")
    },

    // The FULL stored-screen stack in ONE ingest call (FullScreen):
    // d21 exact/near triage + d24 Jaccard partners + d26 containment
    // partners + t29 stored-LM gate + d12-style 5-gram decontam, all
    // over ONE normalized batch checkpoint and stored corpus
    // artifacts only (the serve plan reads no corpus text —
    // plan-asserted). The oracle re-derives every column from
    // scratch: each stage's standalone CTE chain, composed.
    GraftQuery(
      "d30_full_screen",
      s"""$bandCte,
         |f AS (SELECT doc_id, md5($norm) AS fp FROM documents),
         |ex AS (SELECT DISTINCT n.doc_id FROM f n JOIN f s2
         |        ON n.fp = s2.fp AND n.doc_id >= 250 AND s2.doc_id < 250),
         |nw AS (SELECT c.doc_id, count(DISTINCT a.doc_id) AS n_near
         |       FROM bands a JOIN bands c
         |         ON a.b = c.b AND a.bucket = c.bucket
         |        AND a.doc_id < 250 AND c.doc_id >= 250
         |       GROUP BY c.doc_id),
         |docs AS (SELECT doc_id, list_distinct(string_split($norm, ' ')) AS toks
         |         FROM documents),
         |jd AS (SELECT b.doc_id, count(*) AS n_jacc
         |       FROM docs a JOIN docs b ON a.doc_id < 250 AND b.doc_id >= 250
         |       WHERE len(list_filter(a.toks, x -> list_contains(b.toks, x))) * 10 >=
         |         (len(a.toks) + len(b.toks)
         |           - len(list_filter(a.toks, x -> list_contains(b.toks, x)))) * 9
         |       GROUP BY b.doc_id),
         |cd AS (SELECT b.doc_id, count(*) AS n_contain
         |       FROM docs a JOIN docs b ON a.doc_id < 250 AND b.doc_id >= 250
         |       WHERE len(list_filter(b.toks, x -> list_contains(a.toks, x))) * 10 >=
         |         len(b.toks) * 9
         |       GROUP BY b.doc_id),
         |tk AS (SELECT doc_id, string_split($norm, ' ') AS a FROM documents),
         |mb AS (
         |  SELECT u.w1 AS w1, u.w2 AS w2
         |  FROM (SELECT doc_id,
         |          unnest([{'w1': a[i], 'w2': a[i+1]}
         |                  for i in generate_series(1, len(a) - 1)]) AS u
         |        FROM tk WHERE len(a) >= 2 AND doc_id < 250)),
         |bc AS (SELECT w1, w2, count(*) AS c FROM mb GROUP BY 1, 2),
         |cw1 AS (SELECT w1, sum(c) AS ctx, count(*) AS n1f FROM bc GROUP BY w1),
         |pc AS (SELECT w2, count(*) AS n1p FROM bc GROUP BY w2),
         |tt AS (SELECT count(*) * 1.0 AS t_types FROM bc),
         |vv AS (SELECT count(DISTINCT t) * 1.0 AS v_vocab
         |       FROM (SELECT w1 AS t FROM bc UNION ALL SELECT w2 FROM bc)),
         |bg AS (
         |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
         |  FROM (SELECT doc_id,
         |          unnest([{'w1': a[i], 'w2': a[i+1]}
         |                  for i in generate_series(1, len(a) - 1)]) AS u
         |        FROM tk WHERE len(a) >= 2 AND doc_id >= 250)),
         |lm AS (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |    round(avg(ln(CASE WHEN ctx IS NULL
         |      THEN (coalesce(n1p, 0) + 1) / (t_types + v_vocab)
         |      ELSE greatest(coalesce(c, 0) - 0.75, 0.0) / ctx
         |        + ((0.75 * n1f) / ctx)
         |          * ((coalesce(n1p, 0) + 1) / (t_types + v_vocab)) END)), 4)
         |      AS mean_logprob
         |  FROM bg LEFT JOIN bc USING (w1, w2) LEFT JOIN cw1 USING (w1)
         |    LEFT JOIN pc USING (w2) CROSS JOIN tt CROSS JOIN vv
         |  GROUP BY doc_id),
         |t5 AS (SELECT doc_id, list_distinct(
         |         [array_to_string(a[i : i + 4], ' ')
         |          for i in generate_series(1, len(a) - 4)]) AS grams
         |       FROM tk),
         |g5 AS (SELECT doc_id, unnest(grams) AS gram FROM t5),
         |cg AS (SELECT DISTINCT gram FROM g5 WHERE doc_id < 250),
         |hit AS (SELECT b.doc_id, count(*) AS n_hit
         |        FROM g5 b JOIN cg USING (gram)
         |        WHERE b.doc_id >= 250 GROUP BY b.doc_id),
         |tot AS (SELECT doc_id, len(grams) AS n_grams FROM t5 WHERE doc_id >= 250)
         |SELECT d.doc_id,
         |  CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
         |       WHEN nw.doc_id IS NOT NULL THEN 'near_dup'
         |       ELSE 'fresh' END AS status,
         |  coalesce(nw.n_near, 0)::BIGINT AS n_near_witnesses,
         |  coalesce(jd.n_jacc, 0)::BIGINT AS n_jaccard_dups,
         |  coalesce(cd.n_contain, 0)::BIGINT AS n_containment_dups,
         |  coalesce(lm.n_bigrams, 0)::BIGINT AS n_bigrams,
         |  coalesce(lm.mean_logprob, 0.0) AS mean_logprob,
         |  tot.n_grams::BIGINT AS n_grams,
         |  coalesce(hit.n_hit, 0)::BIGINT AS n_hit,
         |  round(coalesce(hit.n_hit, 0) / greatest(tot.n_grams, 1), 4)
         |    AS contam_ratio,
         |  coalesce(hit.n_hit, 0) > 0 AS is_contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id >= 250) d
         |LEFT JOIN ex USING (doc_id)
         |LEFT JOIN nw USING (doc_id)
         |LEFT JOIN jd USING (doc_id)
         |LEFT JOIN cd USING (doc_id)
         |LEFT JOIN lm USING (doc_id)
         |LEFT JOIN tot USING (doc_id)
         |LEFT JOIN hit USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      graft.dedup.FullScreen.screen(s, dir, "documents",
          batch = d.filter(col("doc_id") >= 250), "doc_id",
          corpusFilter = col("doc_id") < 250)
        .orderBy("doc_id")
    },

    // SPLIT-LEAKAGE audit: cross-split near-dup pairs under the t6
    // deterministic split — the train/test contamination check every
    // training pipeline needs (a test doc with a train near-twin
    // inflates eval). EXACT pair graph (d23), so a reported zero
    // means zero. Output: per split-pair counts + distinct affected
    // docs on each side.
    GraftQuery(
      "p5_split_leakage",
      s"""WITH docs AS (
         |  SELECT doc_id, list_distinct(string_split($norm, ' ')) AS toks
         |  FROM documents),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN b < 12 THEN 'train' WHEN b < 14 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |          strpos('0123456789abcdef',
         |            substr(md5(doc_id::varchar), 1, 1)) - 1 AS b
         |        FROM documents)),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
         |  WHERE len(list_filter(a.toks, x -> list_contains(b.toks, x))) * 10 >=
         |    (len(a.toks) + len(b.toks)
         |      - len(list_filter(a.toks, x -> list_contains(b.toks, x)))) * 9),
         |x AS (
         |  SELECT least(sa.split, sb.split) AS split_a,
         |    greatest(sa.split, sb.split) AS split_b,
         |    CASE WHEN sa.split <= sb.split THEN id_a ELSE id_b END AS da,
         |    CASE WHEN sa.split <= sb.split THEN id_b ELSE id_a END AS db
         |  FROM pairs
         |  JOIN sp sa ON id_a = sa.doc_id JOIN sp sb ON id_b = sb.doc_id
         |  WHERE sa.split <> sb.split)
         |SELECT split_a, split_b, count(*) AS n_pairs,
         |  count(DISTINCT da) AS n_docs_a, count(DISTINCT db) AS n_docs_b
         |FROM x GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val split = d.select(col("doc_id"), expr(
          "instr('0123456789abcdef', substr(md5(cast(doc_id AS string)), 1, 1)) - 1")
          .as("b"))
        .select(col("doc_id"),
          when(col("b") < 12, "train").when(col("b") < 14, "val")
            .otherwise("test").as("split"))
      // STORE-SERVED pair graph (the d23 pairs piece): the audit
      // reads persisted exact pairs instead of re-running the PPJoin
      val pairs = graft.dedup.PrefixStore.similarPairs(
        s, dir, "documents", tauNum = 9, tauDen = 10)
      pairs
        .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
        .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
        .where(col("sa") =!= col("sb"))
        .select(least(col("sa"), col("sb")).as("split_a"),
          greatest(col("sa"), col("sb")).as("split_b"),
          when(col("sa") <= col("sb"), col("id_a")).otherwise(col("id_b")).as("da"),
          when(col("sa") <= col("sb"), col("id_b")).otherwise(col("id_a")).as("db"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("da")).as("n_docs_a"),
          countDistinct(col("db")).as("n_docs_b"))
        .orderBy("split_a", "split_b")
    }
  )
}
