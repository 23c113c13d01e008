package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.IncrementalDocArtifact.{MergePiece, Piece}

/** Store-side time travel (round 13, mirroring
  * `PartitionedLayoutTimeTravelSpec`): every ledger commit lands an
  * immutable `_history/v<n>` copy; `serveVersion` reads any piece as
  * that version committed it. Appends are travelable for free; folds
  * keep one grace window at the default retention and refuse after
  * the next fold reclaims; `graft.store.retainVersions` extends the
  * reach across rollbacks (the retract's generations RETIRE instead
  * of dying); `vacuumVersions` reclaims the deferred space; live
  * serves are never affected.
  */
class IncrementalTimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def newCorpus(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-tt-$tag")
    s"$d/documents.parquet"
  }

  private def handle(corpus: String) =
    IncrementalDocArtifact(corpus, "tt1",
      Seq(Piece("rows", (docs, _) => docs)),
      Seq(MergePiece("gmax", Seq("grp"),
        buildFull = (docs, _) => docs
          .select(pmod(col("doc_id"), lit(3L)).as("grp"), col("doc_id"))
          .groupBy("grp").agg(max("doc_id").as("mx")),
        advance = ctx => {
          val fresh = ctx.newDocs
            .select(pmod(col("doc_id"), lit(3L)).as("grp"), col("doc_id"))
            .groupBy("grp").agg(max("doc_id").as("mx"))
          fresh.join(ctx.stored("gmax").withColumnRenamed("mx", "mx0"),
              Seq("grp"), "left")
            .select(col("grp"), greatest(col("mx"),
              coalesce(col("mx0"), lit(Long.MinValue))).as("mx"))
        })),
      compactEvery = 0)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  private def gmax(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("grp", "mx").as[(Long, Long)].collect().toMap

  private def dataFiles(corpus: String): Set[Path] = {
    val s = Files.list(Paths.get(corpus))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter { f =>
        val n = f.getFileName.toString
        !(n.startsWith("_") || n.startsWith("."))
      }.toSet
    } finally s.close()
  }

  private def withRetain[T](n: Int)(body: => T): T = {
    val prev = sys.props.get("graft.store.retainVersions")
    sys.props("graft.store.retainVersions") = n.toString
    try body
    finally prev match {
      case Some(v) => sys.props("graft.store.retainVersions") = v
      case None => sys.props -= "graft.store.retainVersions"
    }
  }

  test("appends are travelable to every version for free; unknown versions refuse with the list") {
    val corpus = newCorpus("appendonly")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(corpus)
    val h = handle(corpus)
    h.serve(spark, "rows").count() shouldBe 3 // v1: full build
    Seq((7L, "d")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(corpus)
    h.serve(spark, "rows").count() shouldBe 4 // v2: advance
    Seq((11L, "e"), (12L, "f")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(corpus)
    h.serve(spark, "rows").count() shouldBe 6 // v3

    h.versions() shouldBe Seq(1L, 2L, 3L)
    ids(h.serveVersion(spark, "rows", 1)) shouldBe Set(1L, 2L, 3L)
    ids(h.serveVersion(spark, "rows", 2)) shouldBe Set(1L, 2L, 3L, 7L)
    // the live version serves identically through both doors
    ids(h.serveVersion(spark, "rows", 3)) shouldBe ids(h.serve(spark, "rows"))
    // merge pieces resolve LWW at the addressed version
    gmax(h.serveVersion(spark, "gmax", 1)) shouldBe
      Map(0L -> 3L, 1L -> 1L, 2L -> 2L)
    gmax(h.serveVersion(spark, "gmax", 2)) shouldBe
      Map(0L -> 3L, 1L -> 7L, 2L -> 2L)
    gmax(h.serveVersion(spark, "gmax", 3)) shouldBe
      Map(0L -> 12L, 1L -> 7L, 2L -> 11L)

    val e = intercept[IllegalArgumentException](
      h.serveVersion(spark, "rows", 99))
    e.getMessage should include("available: 1, 2, 3")
  }

  test("default retention: one fold leaves a grace window; the next fold reclaims and refuses with the cause") {
    val corpus = newCorpus("foldgrace")
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(corpus)
    val h = handle(corpus)
    h.serve(spark, "rows").count() shouldBe 2 // v1
    Seq((7L, "c")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(corpus)
    h.serve(spark, "rows").count() shouldBe 3 // v2
    h.compact(spark) // fold -> v3; v2's gen dir + v1's base stay as grace
    ids(h.serveVersion(spark, "rows", 2)) shouldBe Set(1L, 2L, 7L)
    ids(h.serveVersion(spark, "rows", 1)) shouldBe Set(1L, 2L)

    Seq((9L, "d")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(corpus)
    h.serve(spark, "rows").count() shouldBe 4 // v4
    h.compact(spark) // second fold: grace expires at retain=1
    val e = intercept[IllegalStateException](
      h.serveVersion(spark, "rows", 1))
    e.getMessage should include("garbage-collected past retention")
    // the live serve is never affected
    ids(h.serve(spark, "rows")) shouldBe Set(1L, 2L, 7L, 9L)
  }

  test("raised retention travels across a rollback; vacuumVersions reclaims it") {
    withRetain(2) {
      val corpus = newCorpus("retract")
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
        .coalesce(1).write.parquet(corpus)
      val h = handle(corpus)
      h.serve(spark, "rows").count() shouldBe 2 // v1
      val base = dataFiles(corpus)
      Seq((7L, "c"), (8L, "d")).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(corpus)
      h.serve(spark, "rows").count() shouldBe 4 // v2
      // retract the batch: rollback RETIRES its generation (retain=2
      // keeps v2 servable), live serves the pre-append state
      (dataFiles(corpus) -- base).foreach(Files.delete)
      ids(h.serve(spark, "rows")) shouldBe Set(1L, 2L) // v3
      ids(h.serveVersion(spark, "rows", 2)) shouldBe Set(1L, 2L, 7L, 8L)
      gmax(h.serveVersion(spark, "gmax", 2)) shouldBe
        Map(1L -> 7L, 2L -> 8L)
      // vacuum to the live version only: the retired gen goes now
      val deleted = h.vacuumVersions(keepLast = 1)
      assert(deleted > 0, "vacuum reclaimed nothing")
      val e = intercept[Exception](h.serveVersion(spark, "rows", 2))
      e.getMessage should (include("no version 2") or
        include("garbage-collected past retention"))
      // live untouched
      ids(h.serve(spark, "rows")) shouldBe Set(1L, 2L)
    }
  }

  test("graft.store.historyKeep bounds the history metadata at commit time") {
    System.setProperty("graft.store.historyKeep", "2")
    try {
      val corpus = newCorpus("histkeep")
      Seq((1L, "a")).toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
      val h = handle(corpus)
      h.serve(spark, "rows").count() shouldBe 1 // v1
      for (i <- 2 to 4) {
        Seq((i.toLong * 10, s"x$i")).toDF("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(corpus)
        h.serve(spark, "rows").count() shouldBe i.toLong
      }
      // commits pruned history to the newest 2 (v3's copy + live v4)
      h.versions() shouldBe Seq(3L, 4L)
      ids(h.serveVersion(spark, "rows", 3)) shouldBe Set(1L, 20L, 30L)
      intercept[IllegalArgumentException](h.serveVersion(spark, "rows", 1))
    } finally System.clearProperty("graft.store.historyKeep")
  }

  test("default retention: a retracted version REFUSES rather than serving partial data as that version") {
    // the round-13 review scenario: rollback at retain=1 deletes the
    // dropped generation's dir AND metadata, but _history/v2 remains
    // addressable — serveVersion(2) must refuse with the cause, never
    // silently serve v1's base-only content labeled as version 2
    val corpus = newCorpus("refuse")
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(corpus)
    val h = handle(corpus)
    h.serve(spark, "rows").count() shouldBe 2 // v1
    val base = dataFiles(corpus)
    Seq((7L, "c")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(corpus)
    h.serve(spark, "rows").count() shouldBe 3 // v2
    (dataFiles(corpus) -- base).foreach(Files.delete)
    ids(h.serve(spark, "rows")) shouldBe Set(1L, 2L) // v3: rollback
    val e = intercept[IllegalStateException](
      h.serveVersion(spark, "rows", 2))
    e.getMessage should include("garbage-collected past retention")
    // v1 is still complete and servable
    ids(h.serveVersion(spark, "rows", 1)) shouldBe Set(1L, 2L)
  }

  test("vacuum on an append-only artifact deletes nothing; history prunes to keepLast") {
    val corpus = newCorpus("noop")
    Seq((1L, "a")).toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    val h = handle(corpus)
    h.serve(spark, "rows").count() shouldBe 1 // v1
    Seq((2L, "b")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(corpus)
    h.serve(spark, "rows").count() shouldBe 2 // v2
    h.vacuumVersions(keepLast = 1) shouldBe 0
    h.versions() shouldBe Seq(2L)
    ids(h.serve(spark, "rows")) shouldBe Set(1L, 2L)
    // v2's own generation is still live — travel to it still works
    ids(h.serveVersion(spark, "rows", 2)) shouldBe Set(1L, 2L)
  }
}
