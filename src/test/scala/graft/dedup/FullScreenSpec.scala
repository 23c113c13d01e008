package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{BigramLmStore, TextFunctions}
import graft.sources.ArtifactStore

/** The composed full screen must be EXACTLY the five standalone
  * screens run on the same batch — same statuses, same partner
  * counts, same LM scores, same decontamination verdicts, row for
  * row — and its serve plan must read no corpus text (every file
  * scan under the artifact store; the batch side is the one
  * normalization checkpoint).
  */
class FullScreenSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(): (String, String) = {
    val sf = Files.createTempDirectory("graft-fullscreen").toString
    val docs = Seq(
      // corpus (< 20): two exact twins, a near pair, LM fodder
      0L -> "the quick brown fox jumps over the lazy dog every day",
      1L -> "a slow green turtle walks under the busy bridge at noon",
      2L -> "spark plans catalyst optimizes tungsten executes the query",
      3L -> "the quick brown fox jumps over the lazy dog every night",
      4L -> "completely unrelated musings about distributed storage layers",
      // batch (>= 20): one exact dup of 0, one near/jaccard dup of 1,
      // one contained-in-2, one fresh, one short (no bigrams/grams)
      20L -> "the quick brown fox jumps over the lazy dog every day",
      21L -> "a slow green turtle walks under the busy bridge at dusk",
      22L -> "spark plans catalyst optimizes",
      23L -> "entirely novel content that matches nothing stored here",
      24L -> "one")
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    (sf, s"$sf/documents.parquet")
  }

  test("composed screen == the standalone screens, row for row; plan reads no corpus text") {
    val (sf, _) = corpus()
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val batch = d.filter(col("doc_id") >= 20L)
    val cf = col("doc_id") < 20L
    val full = FullScreen.screen(spark, sf, "documents", batch, "doc_id",
      corpusFilter = cf)
    val rows = full.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(20L, 21L, 22L, 23L, 24L))

    // stage 1+2: d21 triage
    val triage = IngestScreen.screen(spark, sf, "documents", batch,
        "doc_id", cf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    rows.foreach { case (id, r) =>
      assert((r.getString(1), r.getLong(2)) === triage(id), s"triage $id")
    }
    assert(rows(20L).getString(1) === "exact_dup")
    assert(rows(23L).getString(1) === "fresh")

    // stage 3+4: d24/d26 partner counts
    val jacc = PrefixStore.screen(spark, sf, "documents", batch, "doc_id",
        9, 10, cf).groupBy("new_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val contain = PrefixStore.screenContainment(spark, sf, "documents",
        batch, "doc_id", 9, 10, cf).groupBy("new_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, r) =>
      assert(r.getLong(3) === jacc.getOrElse(id, 0L), s"jaccard $id")
      assert(r.getLong(4) === contain.getOrElse(id, 0L), s"containment $id")
    }
    assert(rows(20L).getLong(3) >= 1L) // exact twin is also a jaccard dup
    assert(rows(22L).getLong(4) >= 1L) // contained in stored doc 2

    // stage 5: t29 LM gate (absent row -> 0 bigrams, 0.0 logprob)
    val lm = BigramLmStore.scoreBatch(spark, sf, "documents", batch,
        "doc_id", corpusFilter = cf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    rows.foreach { case (id, r) =>
      val (nb, mlp) = lm.getOrElse(id, (0L, 0.0))
      assert(r.getLong(5) === nb, s"n_bigrams $id")
      assert(r.getDouble(6) === mlp, s"mean_logprob $id")
    }
    assert(rows(24L).getLong(5) === 0L) // the short doc keeps its row

    // stage 6: d12-style decontamination verdict
    val decon = Decontam.reportAgainstGrams(batch,
        GramStore.grams(spark, sf, "documents", 5).filter(cf),
        "doc_id", TextFunctions.normalize(col("text")), 5).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    rows.foreach { case (id, r) =>
      assert((r.getLong(7), r.getLong(8), r.getBoolean(10)) === decon(id),
        s"decontam $id")
    }
    assert(rows(20L).getBoolean(10)) // exact dup is contaminated
    assert(!rows(23L).getBoolean(10))

    // the serve plan reads NO corpus text: every file scan sits under
    // the artifact store; the batch arrives via the one normalization
    // checkpoint (a LogicalRDD, not a scan)
    val scans = full.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(scans.nonEmpty)
    scans.foreach(p => assert(p.contains(ArtifactStore.root),
      s"composed screen scans corpus text: $p"))
  }
}
