package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.operators.PartitionedLayout
import graft.sources.IncrementalDocArtifact.{MergePiece, Piece}

/** The engine has TWO time-travel surfaces — the partitioned-layout
  * committer (`PartitionedLayout.readVersion/vacuum`) and the
  * artifact store (`Handle.serveVersion/vacuumVersions`) — with
  * sibling but separately-implemented retention knobs
  * (`graft.layout.retainVersions` / `graft.store.retainVersions`,
  * plus the store's `historyKeep` commit-time prune). SURVEY §8.15
  * holds the one-page contract table; THIS spec pins the row the
  * table cannot drift from: in each of the three GC'd cases the two
  * surfaces refuse IDENTICALLY —
  *
  *  A. a version that never existed → IllegalArgumentException
  *     naming the missing version AND listing what is available;
  *  B. a version whose DATA a mutation reclaimed past retention,
  *     metadata still present → IllegalStateException saying it is
  *     no longer servable, that the data was garbage-collected past
  *     retention, and NAMING the surface's retainVersions knob (the
  *     operator's fix is in the message);
  *  C. a version explicitly vacuumed away (metadata pruned) →
  *     IllegalArgumentException, indistinguishable from A by design
  *     (vacuum is the operator saying "forget it").
  *
  * The round-12→13 story is why this parity is load-bearing: the two
  * surfaces grew asymmetrically once before (layout had travel for a
  * round while the store did not), and a divergent refusal contract
  * is how the next asymmetry starts.
  */
class TravelContractParitySpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------
  // The shared refusal obligations — one assertion per case, applied
  // to BOTH surfaces.
  // ---------------------------------------------------------------

  private def assertUnknownVersion(body: => Any): Unit = {
    val e = intercept[IllegalArgumentException](body)
    e.getMessage should include("no version")
    e.getMessage should include("available:")
  }

  private def assertReclaimedPastRetention(knob: String)(body: => Any): Unit = {
    val e = intercept[IllegalStateException](body)
    e.getMessage should include("no longer servable")
    e.getMessage should include("garbage-collected past retention")
    e.getMessage should include(knob)
  }

  private def assertVacuumedAway(body: => Any): Unit = {
    val e = intercept[IllegalArgumentException](body)
    e.getMessage should include("no version")
  }

  // ---------------------------------------------------------------
  // Layout-side fixtures (the PartitionedLayoutTimeTravelSpec
  // recipes, minimal form).
  // ---------------------------------------------------------------

  private def newSource(tag: String): String =
    Files.createTempDirectory(s"graft-tparity-$tag")
      .resolve("src.parquet").toString

  private def freshTable(table: String): String = {
    val root = Paths.get(s"${ArtifactStore.root}/partitioned/$table")
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
    table
  }

  private def append(src: String, lo: Long, hi: Long): Unit =
    (lo to hi).map(i => (i % 4, i)).toDF("pk", "id")
      .coalesce(1).write.mode("append").parquet(src)

  private def srcFiles(src: String): Set[java.nio.file.Path] = {
    val s = Files.list(Paths.get(src))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter { f =>
        val n = f.getFileName.toString
        !(n.startsWith("_") || n.startsWith("."))
      }.toSet
    } finally s.close()
  }

  // ---------------------------------------------------------------
  // Store-side fixtures (the IncrementalTimeTravelSpec handle,
  // minimal form; compactEvery = 0 keeps folds explicit).
  // ---------------------------------------------------------------

  private def newCorpus(tag: String): String =
    s"${Files.createTempDirectory(s"graft-tparity-$tag")}/docs.parquet"

  private def handle(corpus: String) =
    IncrementalDocArtifact(corpus, "tp1",
      Seq(Piece("rows", (docs, _) => docs)),
      Seq.empty[MergePiece], compactEvery = 0)

  test("case A: an unknown version refuses identically on both surfaces") {
    // layout
    val src = newSource("a"); freshTable("tparity_a")
    append(src, 1, 20)
    PartitionedLayout.ensureIncremental(spark, src, "tparity_a", "pk",
      identity)
    assertUnknownVersion(
      PartitionedLayout.readVersion(spark, "tparity_a", 99))
    // store
    val corpus = newCorpus("a")
    Seq((1L, "x")).toDF("doc_id", "text").write.parquet(corpus)
    val h = handle(corpus)
    h.serve(spark, "rows").count()
    assertUnknownVersion(h.serveVersion(spark, "rows", 99))
  }

  test("case B: data reclaimed past retention refuses identically, each naming ITS retention knob") {
    // layout: append, retract the increment at default retention —
    // the retracted gen's files are reclaimed with the mutation
    val src = newSource("b"); freshTable("tparity_b")
    append(src, 1, 20)
    PartitionedLayout.ensureIncremental(spark, src, "tparity_b", "pk",
      identity) // v1
    val base = srcFiles(src)
    append(src, 21, 30)
    PartitionedLayout.ensureIncremental(spark, src, "tparity_b", "pk",
      identity) // v2
    (srcFiles(src) -- base).foreach(Files.delete)
    PartitionedLayout.ensureIncremental(spark, src, "tparity_b", "pk",
      identity) // v3: retract, v2's files reclaimed
    assertReclaimedPastRetention("graft.layout.retainVersions")(
      PartitionedLayout.readVersion(spark, "tparity_b", 2))

    // store: append then fold TWICE at default retention (absorbed
    // dirs keep a one-fold grace window; the second fold reclaims)
    val corpus = newCorpus("b")
    Seq((1L, "x")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(corpus)
    val h = handle(corpus)
    h.serve(spark, "rows").count() // v1: rebuild
    Seq((2L, "y")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(corpus)
    h.serve(spark, "rows").count() // v2: advance (gen dir)
    val preFold = h.versions().max
    h.compact(spark) // v3: fold — absorbed gen keeps grace
    Seq((3L, "z")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(corpus)
    h.serve(spark, "rows").count()
    h.compact(spark) // second fold — grace window expires
    assertReclaimedPastRetention("graft.store.retainVersions")(
      h.serveVersion(spark, "rows", preFold).count())
  }

  test("case C: a vacuumed version refuses identically on both surfaces (metadata pruned by design)") {
    // layout: raised retention holds a retract's files, vacuum drops
    // the history manifests older than keepLast
    val prevL = sys.props.get("graft.layout.retainVersions")
    sys.props("graft.layout.retainVersions") = "3"
    try {
      val src = newSource("c"); freshTable("tparity_c")
      append(src, 1, 20)
      PartitionedLayout.ensureIncremental(spark, src, "tparity_c", "pk",
        identity) // v1
      val base = srcFiles(src)
      append(src, 21, 30)
      PartitionedLayout.ensureIncremental(spark, src, "tparity_c", "pk",
        identity) // v2
      (srcFiles(src) -- base).foreach(Files.delete)
      PartitionedLayout.ensureIncremental(spark, src, "tparity_c", "pk",
        identity) // v3 retract; retain=3 keeps v2 servable
      PartitionedLayout.readVersion(spark, "tparity_c", 2).count()
      PartitionedLayout.vacuum("tparity_c", keepLast = 1)
      assertVacuumedAway(
        PartitionedLayout.readVersion(spark, "tparity_c", 2))
    } finally prevL match {
      case Some(v) => sys.props("graft.layout.retainVersions") = v
      case None => sys.props -= "graft.layout.retainVersions"
    }

    // store: same shape through serveVersion/vacuumVersions
    val prevS = sys.props.get("graft.store.retainVersions")
    sys.props("graft.store.retainVersions") = "3"
    try {
      val corpus = newCorpus("c")
      Seq((1L, "x")).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(corpus)
      val h = handle(corpus)
      h.serve(spark, "rows").count() // v1
      Seq((2L, "y")).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(corpus)
      h.serve(spark, "rows").count() // v2
      val v2 = h.versions().max
      h.compact(spark) // fold; retain=3 keeps v2 servable
      h.serveVersion(spark, "rows", v2).count()
      h.vacuumVersions(keepLast = 1)
      assertVacuumedAway(h.serveVersion(spark, "rows", v2))
    } finally prevS match {
      case Some(v) => sys.props("graft.store.retainVersions") = v
      case None => sys.props -= "graft.store.retainVersions"
    }
  }
}
