package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The strongest claim the round-9 merge pieces make is that the
  * incremental result is INVARIANT under how the corpus arrived:
  * one bulk build, or any sequence of appends with serves in
  * between, must produce byte-identical pairs and labels — the
  * `ClusterStoreSpec` generation-chunking discipline applied to the
  * exact-Jaccard and edit-distance stores, on fresh seeded corpora.
  */
class IncrementalChunkingParitySpec extends SparkSpec {
  import spark.implicits._

  private val seeds = Seq(17L, 88L)

  private def randomDocs(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 20).map(i => s"w$i")
    val base = (0 until n).map { i =>
      (i.toLong, Seq.fill(4 + rnd.nextInt(6))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // near-dup perturbations + exact dups of earlier docs, so appends
    // merge and absorb into existing clusters
    val extra = base.filter(_._1 % 3 == 0).map { case (i, s) =>
      val t = s.split(" ")
      (1000L + i, rnd.shuffle(t.drop(1).toSeq ++
        (if (rnd.nextBoolean()) Seq(vocab(rnd.nextInt(vocab.size))) else Nil))
        .mkString(" "))
    } ++ base.filter(_._1 % 5 == 0).map { case (i, s) => (2000L + i, s) }
    rnd.shuffle(base ++ extra)
  }

  test("prefix store: pairs+labels invariant under generation chunking") {
    for (seed <- seeds; chunks <- Seq(1, 3)) {
      val sf = Files.createTempDirectory(s"chunk-ps-$seed-$chunks").toString
      val corpus = s"$sf/documents.parquet"
      val docs = randomDocs(seed, 24)
      val per = (docs.size + chunks - 1) / chunks
      docs.grouped(per).zipWithIndex.foreach { case (g, gi) =>
        g.toDF("doc_id", "text").coalesce(1)
          .write.mode(if (gi == 0) "overwrite" else "append").parquet(corpus)
        // serve between appends so each chunk lands as its own advance
        PrefixStore.clusters(spark, sf, "documents", 1, 2).count()
      }
      val all = spark.read.parquet(corpus)
      withClue(s"seed=$seed chunks=$chunks: ") {
        assertSameRows(
          PrefixStore.similarPairs(spark, sf, "documents", 1, 2),
          PrefixJoin.similarPairs(all, "doc_id", col("text"), 1, 2))
        assertSameRows(
          PrefixStore.clusters(spark, sf, "documents", 1, 2),
          PrefixJoin.clusters(all, "doc_id", col("text"), 1, 2))
      }
    }
  }

  test("edit store: pairs+labels invariant under generation chunking") {
    for (seed <- seeds; chunks <- Seq(1, 3)) {
      val rnd = new scala.util.Random(seed)
      val alpha = "abcd"
      val strs = {
        val base = (0 until 30).map(i => (i.toLong, (0 until 3 + rnd.nextInt(5))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString))
        val extra = base.filter(_._1 % 2 == 0).map { case (i, s) =>
          val p = rnd.nextInt(s.length)
          (500L + i, s.updated(p, alpha(rnd.nextInt(alpha.length))))
        }
        rnd.shuffle(base ++ extra)
      }
      val dir = Files.createTempDirectory(s"chunk-es-$seed-$chunks")
      val corpus = dir.resolve("names.parquet").toString
      val per = (strs.size + chunks - 1) / chunks
      strs.grouped(per).zipWithIndex.foreach { case (g, gi) =>
        g.toDF("sid", "name").coalesce(1)
          .write.mode(if (gi == 0) "overwrite" else "append").parquet(corpus)
        EditStore.clusters(spark, corpus, "name", "sid", col("name"), 1).count()
      }
      val all = spark.read.parquet(corpus).select(col("sid"), col("name"))
      withClue(s"seed=$seed chunks=$chunks: ") {
        assertSameRows(
          EditStore.similarPairs(spark, corpus, "name", "sid", col("name"), 1),
          EditJoin.similarPairs(all, "sid", col("name"), 1))
        val expected = DupClusters.componentsAlternating(
          all.select(col("sid")), "sid",
          EditJoin.similarPairs(all, "sid", col("name"), 1)
            .select("id_a", "id_b"), "id_a", "id_b")
        assertSameRows(
          EditStore.clusters(spark, corpus, "name", "sid", col("name"), 1),
          expected)
      }
    }
  }

  test("media cluster store: labels invariant under generation chunking") {
    import graft.multimodal.{Media, MediaClusterStore}
    for (seed <- seeds; chunks <- Seq(1, 3)) {
      val rnd = new scala.util.Random(seed)
      // random payloads + exact re-uploads of earlier items (the
      // dominant media-dup mode; Hamming-1 bridges are hash-dependent
      // and arise from the md5 chain on some seeds)
      val docs = {
        val base = (0 until 24).map(i =>
          (i.toLong, s"payload ${rnd.nextInt(40)} of item $i"))
        val dups = base.filter(_._1 % 3 == 0).map { case (i, s) =>
          (800L + i, s)
        }
        rnd.shuffle(base ++ dups)
      }
      val sf = Files.createTempDirectory(s"chunk-mc-$seed-$chunks").toString
      val corpus = s"$sf/documents.parquet"
      val per = (docs.size + chunks - 1) / chunks
      docs.grouped(per).zipWithIndex.foreach { case (g, gi) =>
        g.toDF("doc_id", "text").coalesce(1)
          .write.mode(if (gi == 0) "overwrite" else "append").parquet(corpus)
        MediaClusterStore.clusters(spark, sf, "documents").count()
      }
      val all = spark.read.parquet(corpus)
      import spark.implicits._
      val rows = all.select(col("doc_id").as("media_id"), lit("image").as("modality"),
          col("text").cast("binary").as("bytes"), lit("x").as("format"),
          lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"),
          lit(0L).as("duration_ms"))
        .as[Media.MediaRow]
      val hashed = Media.perceptualHash(
        Media.extractFeatures(rows, 16).toDF())
      val expected = DupClusters.componentsContracted(
          hashed.select(col("media_id")), "media_id",
          hashed.select(col("media_id"), col("phash")), "phash",
          reps => Media.phashNearDups(reps, maxDist = 1))
        .select(col("media_id"), col("cluster_id"))
      withClue(s"seed=$seed chunks=$chunks: ") {
        assertSameRows(
          MediaClusterStore.clusters(spark, sf, "documents"), expected)
      }
    }
  }
}
