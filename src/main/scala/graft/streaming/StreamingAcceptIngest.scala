package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

import graft.functions.TextFunctions
import graft.sources.{CorpusLanding, IncrementalDocArtifact}
import graft.sources.IncrementalDocArtifact.Piece

/** The SELF-REFERENTIAL ingest-dedup loop — the canonical
  * training-data front door: documents arrive continuously, each
  * micro-batch is exact-deduplicated against EVERYTHING PREVIOUSLY
  * ACCEPTED (not just a watermarked window — [[StreamingPipeline]]'s
  * `dropDuplicatesWithinWatermark` bounds state by forgetting; a
  * corpus builder cannot forget), and the survivors LAND as corpus
  * generations ([[CorpusLanding]]) of the accepted corpus itself.
  *
  * THE SCREEN IS CORPUS-SIZE-FREE. Exact global dedup needs the full
  * seen set somewhere, but the per-batch TICK must not re-read it —
  * at 100 TB an O(accepted) scan per micro-batch is the whole budget.
  * Two stored pieces of the accepted corpus make the tick O(batch):
  *
  *  - `bloomparts`: ONE mergeable Bloom binary per landed generation
  *    (Spark's own `BloomFilterAggregate` bytes — merge-compatible
  *    because every partial is sized identically from
  *    `expectedItems`, which is baked into the artifact key). The
  *    tick reads ≤ compactEvery+1 small binary rows, merges them
  *    driver-side, and probes the batch with `might_contain` — no
  *    scan of the digest table at all. The fold collapses partials
  *    into one binary (bit-OR, associative — chunking-invariant by
  *    construction).
  *  - `digests` (doc id, fp, _ib), fold-clustered BY FINGERPRINT:
  *    only the Bloom's maybe-hits (true duplicates + ~fpp of the
  *    uniques) pay the exact residue anti-join, and their fps go in
  *    as a capped In predicate — row-group pruning on the
  *    fp-clustered layout instead of a full-table join build. Past
  *    the cap the residue degrades to the plain anti-join (the
  *    engine's capped-gate discipline).
  *
  * Per batch: (1) in-batch first-wins dedup (min id per fingerprint
  * — the [[graft.dedup.ExactDedup]] convention, deterministic under
  * replay); (2) Bloom probe + capped exact residue against the
  * stored digests of STRICTLY EARLIER batches; (3) survivors land
  * with their fingerprint and an `_ib` (ingest-batch) column.
  *
  * THE `_ib` ANCHOR is what makes replay exact. A crash mid-landing
  * can leave a prefix of batch k's files, and a concurrent serve may
  * have already advanced the digest artifact over them — so a naive
  * replay would see its own survivors as "already accepted", screen
  * them out, and land a DIFFERENT survivor set under the same
  * deterministic names (silent corruption: the parts guard only
  * protects same-content replays). The EXACT side screens against
  * `_ib < k`, excluding the batch's own partial landing, so the
  * replay computes the IDENTICAL survivor set and lands exactly the
  * missing files. (The Bloom may contain the partial landing's fps —
  * bits cannot be subtracted — but a Bloom hit only routes a row to
  * the exact residue, which the anchor keeps correct.)
  *
  * At-least-once in, exactly-once accepted corpus out; every store
  * keyed by the accepted-corpus path (co-occurrence, TF-IDF, bands,
  * …) maintains itself over it with the full artifact ops plane.
  */
object StreamingAcceptIngest {

  /** Residue fps above this collect cap fall back to the full
    * anti-join (overridable for specs via
    * `graft.accept.residueCap`).
    */
  private def residueCap: Int =
    sys.props.get("graft.accept.residueCap")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ >= 1).getOrElse(100000)

  private def corpusDir(outDir: String): String = s"$outDir/corpus"

  private def bloomBits(n: Long): Long =
    graft.dedup.BloomDedup.optimalNumBits(n, 0.01)

  /** BloomFilterAggregate SILENTLY clamps to the runtime-bloom-filter
    * confs — a clamped screen filter degrades fpp toward 1 and every
    * tick falls back to the O(accepted) exact join the design exists
    * to avoid, while the `_e<n>` artifact key claims the provisioning
    * took effect. Refuse loudly instead.
    */
  private def requireBloomCapacity(spark: SparkSession,
      expectedItems: Long): Unit = {
    val maxItems = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong
    val maxBits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong
    require(expectedItems <= maxItems && bloomBits(expectedItems) <= maxBits,
      s"expectedItems=$expectedItems needs ${bloomBits(expectedItems)} " +
        s"bloom bits, past the runtime-bloom-filter caps " +
        s"(maxNumItems=$maxItems, maxNumBits=$maxBits) — Spark would " +
        "clamp the filter SILENTLY and the screen would degrade to " +
        "O(accepted) per tick; raise the two confs to provision this " +
        "loop, or lower expectedItems")
  }

  private def bloomAggCol(fp: org.apache.spark.sql.Column,
      expectedItems: Long) =
    call_function("graft_bloom_agg", xxhash64(fp),
      lit(expectedItems), lit(bloomBits(expectedItems)))

  /** Content fingerprint with NULL-TEXT discipline: a null text
    * fingerprints as the empty document (one such doc is ever
    * accepted) — a null fp would silently escape every anti-join and
    * land one null doc per batch forever.
    */
  private def fpCol(textCol: String) =
    TextFunctions.fingerprint(
      coalesce(TextFunctions.normalize(col(textCol)), lit("")))

  /** Driver-side bit-OR of same-sized Bloom binaries. */
  private def mergeBlooms(parts: Seq[Array[Byte]]): Option[Array[Byte]] =
    parts.filter(_ != null) match {
      case Seq() => None
      case head +: tail =>
        val f = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(head))
        tail.foreach { b =>
          f.mergeInPlace(org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(b)))
        }
        val bos = new java.io.ByteArrayOutputStream()
        f.writeTo(bos)
        Some(bos.toByteArray)
    }

  /** The exact-screen pieces, shared by both artifact families:
    * (id, fp, _ib) digests fold-clustered by fp, plus one mergeable
    * Bloom binary per generation.
    */
  private def exactPieces(idCol: String, expectedItems: Long): Seq[Piece] =
    Seq(
      Piece("digests", (docs, _) =>
        docs.select(col(idCol), col("fp"), col("_ib")),
        // cluster by fp: the capped-In residue probe prunes row groups
        fold = Some(_.repartition(col("fp"))
          .sortWithinPartitions("fp", "_ib"))),
      Piece("bloomparts", (docs, _) => {
        graft.plans.GraftFunctions.ensureRegistered(docs.sparkSession)
        docs.agg(bloomAggCol(col("fp"), expectedItems).as("bf"))
      },
        fold = Some { df =>
          import scala.jdk.CollectionConverters._
          val merged = mergeBlooms(
            df.collect().map(_.getAs[Array[Byte]]("bf")).toSeq)
          df.sparkSession.createDataFrame(
            merged.toSeq.map(Row(_)).asJava,
            StructType(Seq(StructField("bf", BinaryType))))
        }))

  /** Stored screen artifact of the accepted corpus (exact mode).
    * `expectedItems` is part of the key — partials merge only at
    * identical sizing, so changing it keys a fresh build instead of
    * corrupting the merge.
    */
  private def digestHandle(corpusPath: String, idCol: String,
      textCol: String, expectedItems: Long) =
    IncrementalDocArtifact(corpusPath,
      s"accept_${idCol}_${textCol}_e$expectedItems",
      exactPieces(idCol, expectedItems))

  /** THE exact screen: rows of `inBatch` (already in-batch-deduped,
    * fp attached) whose fingerprint no STRICTLY-EARLIER batch
    * accepted. One implementation for both modes — Bloom probe from
    * the stored partials, capped-In exact residue on the
    * fp-clustered digest fold, `_ib < batchId` anchor.
    */
  private def exactScreen(h: IncrementalDocArtifact.Handle,
      spark: SparkSession, inBatch: DataFrame, batchId: Long): DataFrame = {
    val bloom = mergeBlooms(h.serve(spark, "bloomparts")
      .collect().map(_.getAs[Array[Byte]]("bf")).toSeq)
    // a null/absent filter must claim "maybe" (exactness first)
    val might = bloom match {
      case Some(bytes) => coalesce(
        call_function("graft_might_contain", lit(bytes),
          xxhash64(col("fp"))), lit(true))
      case None => lit(true)
    }
    val definitelyNew = inBatch.filter(!might)
    val maybe = inBatch.filter(might)
    // the replay anchor: strictly-earlier batches only (class doc)
    val seen = h.serve(spark, "digests").where(col("_ib") < batchId)
    val cap = residueCap
    val fps = maybe.select("fp").distinct()
      .limit(cap + 1).collect().map(_.getString(0))
    val seenSide =
      (if (fps.length <= cap)
        // capped-In probe: row-group pruning on the fp-clustered
        // fold layout — the residue never pays a full join build
        seen.where(col("fp").isInCollection(fps.toSeq))
      else seen).select("fp").distinct()
    definitelyNew.unionByName(
      maybe.join(seenSide, Seq("fp"), "left_anti"))
  }

  /** In-batch first-wins dedup (min id per fingerprint — the
    * [[graft.dedup.ExactDedup]] convention, deterministic under
    * replay), fp attached; pinned (the screen reads it twice).
    */
  private def inBatchDedup(batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val w = Window.partitionBy("fp").orderBy(col(idCol))
    batch.withColumn("fp", fpCol(textCol))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
      .localCheckpoint()
  }

  /** Verification signature: 32 INDEPENDENT-seed MinHash components
    * (min over shingles of xxhash64(shingle ++ seed)). The banding
    * signature's linear seeded family (b1 + s*b2 over one base pair)
    * is fine for CANDIDATE generation but unusable as an estimator:
    * one globally-small shingle attains the min for every seed at
    * once, so components correlate heavily and random pairs estimate
    * high (measured: ~40% of bucket-colliding J~0 pairs at est >=
    * 0.75, 10% at 1.0). Independent seeds make the components i.i.d.
    * Bernoulli(J) — the textbook estimator — so a threshold actually
    * separates near-dups from collisions.
    */
  private val VerK = 32

  private def verSig(docs: DataFrame, idCol: String,
      norm: org.apache.spark.sql.Column): DataFrame = {
    val sh = graft.dedup.MinHashLSH.shingleRows(docs, idCol, norm)
    val aggs = (0 until VerK).map(v =>
      min(xxhash64(concat(col("shingle"), lit(s"#$v")))).as(s"v$v"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until VerK).map(v => col(s"v$v")): _*).as("sig"))
  }

  private def requireCleanColumns(batch: DataFrame): Unit =
    require(!batch.columns.contains("fp") && !batch.columns.contains("_ib"),
      "the ingested frame must not carry 'fp' or '_ib' columns — the " +
        "accept loop owns them (they land with the rows)")

  /** Accept one batch: in-batch dedup, screen vs earlier batches,
    * land survivors, advance the screen artifact. The manual /
    * backfill door, and the micro-batch body of [[start]].
    *
    * @param expectedItems Bloom sizing for the seen side — the
    *   accepted-corpus cardinality this loop is provisioned for
    *   (part of the artifact key; change = fresh screen build)
    */
  def applyBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, outDir: String, parts: Int = 1,
      expectedItems: Long = 4000000L): Unit = {
    if (batch.isEmpty) return
    requireCleanColumns(batch)
    val spark = batch.sparkSession
    graft.plans.GraftFunctions.ensureRegistered(spark)
    requireBloomCapacity(spark, expectedItems)
    val corpus = corpusDir(outDir)
    CorpusLanding.requireLocal(outDir)
    val inBatch = inBatchDedup(batch, idCol, textCol)
    val fresh =
      if (CorpusLanding.hasData(corpus))
        exactScreen(digestHandle(corpus, idCol, textCol, expectedItems),
          spark, inBatch, batchId)
      else inBatch
    // pinned: the emptiness check and the landing must read ONE
    // evaluation of the screen (not re-run the probe + residue join)
    val survivors = fresh.withColumn("_ib", lit(batchId))
      .localCheckpoint()
    // survivors can be empty (an all-duplicate batch): nothing lands,
    // nothing advances — the replay of such a batch is trivially
    // idempotent (same screen, same empty survivor set)
    if (!survivors.isEmpty) {
      CorpusLanding.land(survivors, batchId, corpus, hashCol = "fp",
        parts = parts)
      // tick: advance the screen artifact over the landed generation
      digestHandle(corpus, idCol, textCol, expectedItems)
        .serve(spark, "digests")
      ()
    }
  }

  def start(docs: DataFrame, idCol: String, textCol: String,
      outDir: String, checkpoint: String, trigger: Trigger,
      expectedItems: Long = 4000000L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, idCol, textCol, outDir,
          expectedItems = expectedItems)
      }
      .start()

  // -----------------------------------------------------------------
  // NEAR-DUP accept mode: exact screen + MinHash near-dup screen
  // against everything previously accepted. Its own artifact family
  // (`acceptnear_…`) — an exact-only sink never pays band/signature
  // maintenance; one mode per outDir.
  // -----------------------------------------------------------------

  /** Screen artifact for the near mode: the exact pieces (digests +
    * bloomparts) PLUS per-doc MinHash signatures (id-clustered — the
    * verification lookup pushes a capped In) and the banded LSH index
    * ((band, bucket)-clustered — the probe pushes the batch's bucket
    * set). All additive: bands/signatures derive per doc from the
    * landed text.
    */
  private def nearHandle(corpusPath: String, idCol: String,
      textCol: String, expectedItems: Long) = {
    val norm = TextFunctions.normalize(col(textCol))
    IncrementalDocArtifact(corpusPath,
      s"acceptnear_${idCol}_${textCol}_e$expectedItems",
      exactPieces(idCol, expectedItems) ++ Seq(
      Piece("sigs", (docs, _) =>
        verSig(docs, idCol, norm)
          .join(docs.select(col(idCol), col("_ib")), Seq(idCol)),
        fold = Some(df => df.repartition(col(idCol))
          .sortWithinPartitions(idCol))),
      Piece("bands", (docs, _) =>
        graft.dedup.MinHashLSH.bandedIndex(docs, idCol, norm)
          .join(docs.select(col(idCol), col("_ib")), Seq(idCol)),
        fold = Some(df => df.repartition(col("band"), col("bucket"))
          .sortWithinPartitions("band", "bucket")))))
  }

  /** [[applyBatch]] with a SECOND screen: a doc is rejected if its
    * ESTIMATED Jaccard (matching INDEPENDENT-SEED MinHash components
    * / 32 — the textbook estimator, see [[verSig]] for why the
    * banding signature cannot be used here) against ANY
    * previously-accepted doc, or any surviving smaller-id doc of its
    * own batch, reaches `threshold`. Candidates come from
    * the stored banded index (probe pushes the batch's bucket set as
    * a capped In on the (band, bucket)-clustered fold; verification
    * pushes candidate ids on the id-clustered signature fold — the
    * tick never scans the stored index). `maxIndexPerBucket` is the
    * candidate-volume knob ([[StreamingLshDedup]]'s): hot buckets
    * keep their earliest witnesses, so a genuinely-new doc colliding
    * with a crowd still verifies against the crowd's representatives;
    * a near-dup whose only similar witness was capped out can slip
    * through (documented trade, raise the cap for exactness).
    *
    * Replay discipline is [[applyBatch]]'s: the exact residue AND the
    * near-dup screen anchor on `_ib < batchId`, so a crashed
    * attempt's own partial landing never changes the replay's
    * survivor set; in-batch near-dups resolve deterministically
    * (a doc drops iff it estimates ≥ threshold against a SMALLER-id
    * surviving-exact doc of the batch — id order, not arrival order).
    */
  def applyBatchNear(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, outDir: String, threshold: Double,
      parts: Int = 1, expectedItems: Long = 4000000L,
      maxIndexPerBucket: Int = 64): Unit = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    if (batch.isEmpty) return
    requireCleanColumns(batch)
    val spark = batch.sparkSession
    graft.plans.GraftFunctions.ensureRegistered(spark)
    requireBloomCapacity(spark, expectedItems)
    val corpus = corpusDir(outDir)
    CorpusLanding.requireLocal(outDir)
    val h = nearHandle(corpus, idCol, textCol, expectedItems)
    val inBatch = inBatchDedup(batch, idCol, textCol)
    val hasPrior = CorpusLanding.hasData(corpus)
    // exact screen first (ONE implementation with applyBatch), pinned:
    // the signature table AND the final anti-join both read it — an
    // unpinned frame would re-run the bloom probe + residue join
    val exactFresh =
      (if (hasPrior) exactScreen(h, spark, inBatch, batchId)
      else inBatch).localCheckpoint()
    // ---- near screen over the exact survivors ----
    // candidates from the engine's standard banding; VERIFICATION by
    // the independent-seed signature (see [[verSig]])
    val norm = TextFunctions.normalize(col(textCol))
    val batchSigs = verSig(exactFresh, idCol, norm).localCheckpoint()
    val batchBands = graft.dedup.MinHashLSH
      .bandedIndex(exactFresh, idCol, norm)
      .localCheckpoint()
    def estimate(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / lit(VerK.toDouble)
    // vs the ACCEPTED index (anchored): capped bucket-set probe, then
    // capped id lookup on the signature fold, then the estimator
    val dupVsAccepted: DataFrame =
      if (hasPrior) {
        val buckets = batchBands.select("bucket").distinct()
          .limit(residueCap + 1).collect().map(_.getString(0))
        val storedBands0 = h.serve(spark, "bands")
          .where(col("_ib") < batchId)
        val storedBands =
          if (buckets.length <= residueCap)
            storedBands0.where(col("bucket").isInCollection(buckets.toSeq))
          else storedBands0
        val cands = graft.dedup.MinHashLSH.probeCandidatesBanded(
          storedBands.select(col(idCol), col("band"), col("bucket")),
          batchBands, idCol, maxIndexPerBucket)
          .localCheckpoint()
        val candIds = cands.select("id_index").distinct()
          .limit(residueCap + 1).collect().map(_.get(0))
        val sigs0 = h.serve(spark, "sigs").where(col("_ib") < batchId)
        val storedSigs =
          (if (candIds.length <= residueCap)
            sigs0.where(col(idCol).isInCollection(candIds.toSeq))
          else sigs0).select(col(idCol).as("id_index"),
            col("sig").as("sig_a"))
        cands.join(storedSigs, "id_index")
          .join(batchSigs.select(col(idCol).as("id_probe"),
            col("sig").as("sig_b")), "id_probe")
          .where(estimate(col("sig_a"), col("sig_b")) >= threshold)
          .select(col("id_probe").as(idCol)).distinct()
      } else exactFresh.limit(0).select(col(idCol))
    // vs SMALLER-ID batch peers (deterministic in-batch resolution)
    // capped like the stored-index probe: a boilerplate-heavy batch
    // colliding in one bucket must not expand quadratically — the
    // kept witnesses are the smallest ids (same deterministic
    // truncation semantics as maxIndexPerBucket)
    val peerPairs = graft.dedup.PairGen.pairsWithin(
        batchBands.select(col("band"), col("bucket"), col(idCol)),
        Seq("band", "bucket"), col(idCol), maxIndexPerBucket)
      .select(col("a"), col("b")).distinct()
    val dupVsPeers = peerPairs
      .join(batchSigs.select(col(idCol).as("a"), col("sig").as("sig_a")), "a")
      .join(batchSigs.select(col(idCol).as("b"), col("sig").as("sig_b")), "b")
      .where(estimate(col("sig_a"), col("sig_b")) >= threshold)
      .select(col("b").as(idCol)).distinct() // b is the larger id
    val fresh = exactFresh
      .join(dupVsAccepted.unionByName(dupVsPeers).distinct(),
        Seq(idCol), "left_anti")
    val survivors = fresh.withColumn("_ib", lit(batchId))
      .localCheckpoint()
    if (!survivors.isEmpty) {
      CorpusLanding.land(survivors, batchId, corpus, hashCol = "fp",
        parts = parts)
      h.serve(spark, "digests")
      ()
    }
  }

  /** [[start]] in near-dup mode. */
  def startNear(docs: DataFrame, idCol: String, textCol: String,
      outDir: String, checkpoint: String, trigger: Trigger,
      threshold: Double, expectedItems: Long = 4000000L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatchNear(batch, batchId, idCol, textCol, outDir,
          threshold, expectedItems = expectedItems)
      }
      .start()

  /** The accepted corpus — every surviving document row (original
    * columns + `fp` + `_ib`). This IS a corpus directory: any
    * corpus-keyed store pointed at it maintains itself over the
    * accepted set.
    */
  def accepted(spark: SparkSession, outDir: String): DataFrame = {
    val corpus = corpusDir(outDir)
    if (!CorpusLanding.hasData(corpus)) throw new IllegalStateException(
      s"no accepted documents under $outDir — start the stream (or " +
        "point at its outDir) before reading")
    spark.read.parquet(corpus)
  }

  /** The accepted corpus AS OF ingest batch `batchId` — the
    * reproducible-training-data read ("which documents had been
    * accepted when shard build k ran"). Free and exact: landings are
    * append-only and every row carries its `_ib`, so the as-of view
    * is one pushed-down filter — no snapshot machinery needed (the
    * screen ARTIFACT's versions travel through the store's own
    * `serveVersion` door).
    */
  def acceptedAsOf(spark: SparkSession, outDir: String,
      batchId: Long): DataFrame =
    accepted(spark, outDir).where(col("_ib") <= batchId)

  /** The corpus directory path of this loop's accepted set — the
    * address to hand other corpus-keyed stores.
    */
  def acceptedCorpusPath(outDir: String): String = corpusDir(outDir)

  /** Stored digest view (id, fp, _ib) of the EXACT-mode screen
    * artifact (near-mode sinks: [[digestsNear]] — the families are
    * separate, and serving the wrong one would build a redundant
    * second screen over the whole corpus).
    */
  def digests(spark: SparkSession, outDir: String, idCol: String,
      textCol: String, expectedItems: Long = 4000000L): DataFrame =
    digestHandle(corpusDir(outDir), idCol, textCol, expectedItems)
      .serve(spark, "digests")

  /** [[digests]] for a near-mode sink. */
  def digestsNear(spark: SparkSession, outDir: String, idCol: String,
      textCol: String, expectedItems: Long = 4000000L): DataFrame =
    nearHandle(corpusDir(outDir), idCol, textCol, expectedItems)
      .serve(spark, "digests")

  /** Fold the EXACT-mode screen artifact now (also runs on the store
    * cadence); near-mode sinks: [[compactNear]].
    */
  def compact(spark: SparkSession, outDir: String, idCol: String,
      textCol: String, expectedItems: Long = 4000000L): Unit =
    digestHandle(corpusDir(outDir), idCol, textCol, expectedItems)
      .compact(spark)

  /** [[compact]] for a near-mode sink (folds digests, bloom partials,
    * signatures and the banded index together).
    */
  def compactNear(spark: SparkSession, outDir: String, idCol: String,
      textCol: String, expectedItems: Long = 4000000L): Unit =
    nearHandle(corpusDir(outDir), idCol, textCol, expectedItems)
      .compact(spark)
}
