package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incrementally-maintained hive layout: directory pruning works
  * and matches the flat scan, the unchanged-ledger path is zero-work,
  * an APPEND re-clusters only the new files (old data files
  * byte-untouched), a crashed half-append stays invisible behind the
  * manifest (prior layout serves bit-identically) and heals on the
  * next ensure, and a source rewrite re-lays out wholesale.
  */
class PartitionedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def newSource(tag: String): String =
    Files.createTempDirectory(s"graft-playout-$tag")
      .resolve("src.parquet").toString

  import scala.jdk.CollectionConverters._
  private def stamp(root: String): Map[String, Long] = {
    val st = Files.walk(Paths.get(root))
    try st.iterator().asScala.filter(Files.isRegularFile(_))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    finally st.close()
  }

  private def layoutRoot(table: String): String =
    s"${graft.sources.ArtifactStore.root}/partitioned/$table"

  test("predicate on the partition column prunes directories; values equal the flat scan") {
    val src = newSource("prune")
    val df = (1L to 3000L).map(i => (i % 10, i, s"v$i")).toDF("pk", "id", "v")
    df.write.parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_prune", "pk",
      identity)
    val q = PartitionedLayout.read(spark, "pspec_prune")
      .where(col("pk") === 3 || col("pk") === 7)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    // the filter lands in PartitionFilters (planning-time directory
    // pruning), leaving nothing for the row-level DataFilters
    p should include regex "PartitionFilters: \\[.*pk"
    p should include("DataFilters: []")
    assertSameRows(
      q.select("pk", "id", "v"),
      df.where(col("pk") === 3 || col("pk") === 7))
  }

  test("unchanged ledger is zero-work; append re-clusters ONLY the new files") {
    val src = newSource("inc")
    (1L to 100L).map(i => (i % 4, i)).toDF("pk", "id")
      .coalesce(1).write.parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_inc", "pk",
      identity)
    val before = stamp(layoutRoot("pspec_inc"))
    // unchanged: nothing rewritten, byte-identical layout
    PartitionedLayout.ensureIncremental(spark, src, "pspec_inc", "pk",
      identity)
    assert(stamp(layoutRoot("pspec_inc")) === before,
      "reuse path rewrote layout files")
    // append rows for existing pk=0 and a brand-new pk=99
    (1L to 20L).map(i => (if (i <= 10) 0L else 99L, i + 1000L))
      .toDF("pk", "id").coalesce(1).write.mode("append").parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_inc", "pk",
      identity)
    val after = stamp(layoutRoot("pspec_inc"))
    // every pre-existing data file byte-untouched: the increment only
    // ADDED files (to pk=0 and the new pk=99 directory)
    before.foreach { case (f, t) =>
      assert(after.contains(f) && after(f) == t, s"append rewrote $f")
    }
    assert(after.keys.exists(_.contains("pk=99")), "new partition dir missing")
    assertSameRows(
      PartitionedLayout.read(spark, "pspec_inc").select("pk", "id"),
      spark.read.parquet(src).select("pk", "id"))
  }

  private def readDataRoot(table: String): String = {
    val lines = Files.readAllLines(
      Paths.get(layoutRoot(table), "_manifest")).asScala
    lines.find(_.startsWith("#root:")).get.stripPrefix("#root:")
  }

  test("a crashed half-append is invisible; the next ensure heals it") {
    val src = newSource("crash")
    (1L to 60L).map(i => (i % 3, i)).toDF("pk", "id")
      .coalesce(1).write.parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_crash", "pk",
      identity)
    val served = PartitionedLayout.read(spark, "pspec_crash")
      .select("pk", "id").collect().map(_.toSeq).toSet
    // fabricate crash debris: a parquet file inside the live data root
    // that no manifest names (a mid-move crash of an increment)
    val dataRoot = Paths.get(layoutRoot("pspec_crash"), readDataRoot("pspec_crash"))
    val orphanDir = dataRoot.resolve("pk=7")
    Seq((7L, 777L)).toDF("pk", "id").drop("pk")
      .coalesce(1).write.parquet(orphanDir.resolveSibling("_tmp_orphan").toString)
    val tmp = Files.walk(orphanDir.resolveSibling("_tmp_orphan"))
    val pf =
      try tmp.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally tmp.close()
    Files.createDirectories(orphanDir)
    Files.copy(pf, orphanDir.resolve("gdeadbeef-00000.parquet"))
    // the orphan is NOT served: reads resolve exactly the manifest
    assert(PartitionedLayout.read(spark, "pspec_crash")
      .select("pk", "id").collect().map(_.toSeq).toSet === served)
    // and a real append afterwards still lands correctly
    Seq((7L, 7000L)).toDF("pk", "id")
      .coalesce(1).write.mode("append").parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_crash", "pk",
      identity)
    assertSameRows(
      PartitionedLayout.read(spark, "pspec_crash").select("pk", "id"),
      spark.read.parquet(src).select("pk", "id"))
  }

  test("an orphaned staging dir from a crashed append is swept by the next ensure") {
    // a crashed appendIncrement leaves _staging_<gen>; if the source
    // then changes NON-append-only, no replay of that gen ever runs —
    // the sweep at the top of ensureIncremental must GC it anyway
    val src = newSource("stage")
    (1L to 40L).map(i => (i % 2, i)).toDF("pk", "id")
      .coalesce(1).write.parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_stage", "pk",
      identity)
    val orphan = Paths.get(layoutRoot("pspec_stage"), "_staging_deadbeef")
    Files.createDirectories(orphan.resolve("pk=9"))
    Files.writeString(orphan.resolve("pk=9").resolve("part-00000.parquet"),
      "debris")
    // source REWRITE (not append): the crashed gen will never replay
    val df2 = (1L to 10L).map(i => (i % 2, i + 900L)).toDF("pk", "id")
    df2.coalesce(1).write.mode("overwrite").parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_stage", "pk",
      identity)
    Files.exists(orphan) shouldBe false
    assertSameRows(
      PartitionedLayout.read(spark, "pspec_stage").select("pk", "id"), df2)
  }

  test("a zero-file manifest read refuses with the actual cause") {
    // a derive that filters everything out commits a manifest with no
    // data files (partitionBy writes no partCol dirs); reading it must
    // fail with the real reason, not parquet's "unable to infer schema"
    val src = newSource("empty")
    (1L to 10L).map(i => (i % 2, i)).toDF("pk", "id")
      .coalesce(1).write.parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_empty", "pk",
      _.where(lit(false)))
    val e = intercept[IllegalStateException](
      PartitionedLayout.read(spark, "pspec_empty"))
    e.getMessage should include("zero data files")
  }

  test("retracting whole append increments drops their files; unaligned removal re-lays out") {
    val src = newSource("retract")
    def srcFiles(): Set[java.nio.file.Path] = {
      val s = Files.list(Paths.get(src))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter { f =>
          val n = f.getFileName.toString
          !(n.startsWith("_") || n.startsWith("."))
        }.toSet
      } finally s.close()
    }
    (1L to 40L).map(i => (i % 4, i)).toDF("pk", "id")
      .coalesce(1).write.parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_retract", "pk",
      identity)
    val baseSrc = srcFiles()
    val baseLayout = stamp(layoutRoot("pspec_retract"))

    // two advanced increments
    (41L to 50L).map(i => (i % 4, i)).toDF("pk", "id")
      .coalesce(1).write.mode("append").parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_retract", "pk",
      identity)
    val b1 = srcFiles() -- baseSrc
    val afterB1 = stamp(layoutRoot("pspec_retract"))
    (51L to 60L).map(i => (i % 4, i)).toDF("pk", "id")
      .coalesce(1).write.mode("append").parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_retract", "pk",
      identity)
    PartitionedLayout.read(spark, "pspec_retract").count() shouldBe 60

    // RETRACT increment 2: its files drop from the manifest; every
    // file that existed after increment 1 is byte-untouched (no
    // re-layout)
    b1.foreach(identity) // keep b1 for the next phase
    (srcFiles() -- baseSrc -- b1).foreach(Files.delete)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_retract", "pk",
      identity)
    PartitionedLayout.read(spark, "pspec_retract")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.max("id")).head.toSeq shouldBe
      Seq(50L, 50L)
    stamp(layoutRoot("pspec_retract")) shouldBe afterB1

    // RETRACT a file of the ORIGINAL build: no gen provenance → full
    // re-layout, values exact
    baseSrc.foreach(Files.delete) // drop the whole original build file
    PartitionedLayout.ensureIncremental(spark, src, "pspec_retract", "pk",
      identity)
    assertSameRows(
      PartitionedLayout.read(spark, "pspec_retract").select("pk", "id"),
      spark.read.parquet(src).select("pk", "id"))
    // (the superseded root may linger one rewrite as the documented
    // reader grace window — values, not file sets, are the contract
    // here)
    baseLayout should not be empty
  }

  test("a source rewrite re-lays out wholesale and serves the new rows") {
    val src = newSource("rw")
    (1L to 100L).map(i => (i % 4, i)).toDF("pk", "id")
      .coalesce(1).write.parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_rw", "pk",
      identity)
    val root1 = readDataRoot("pspec_rw")
    val df2 = (1L to 50L).map(i => (i % 4, i + 1000L)).toDF("pk", "id")
    df2.coalesce(1).write.mode("overwrite").parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_rw", "pk",
      identity)
    assertSameRows(
      PartitionedLayout.read(spark, "pspec_rw").select("pk", "id"), df2)
    // the superseded root survives ONE rewrite (grace window for
    // in-flight readers of the old manifest) and is GC'd by the next
    Files.exists(Paths.get(layoutRoot("pspec_rw"), root1)) shouldBe true
    val df3 = (1L to 20L).map(i => (i % 4, i + 5000L)).toDF("pk", "id")
    df3.coalesce(1).write.mode("overwrite").parquet(src)
    PartitionedLayout.ensureIncremental(spark, src, "pspec_rw", "pk",
      identity)
    Files.exists(Paths.get(layoutRoot("pspec_rw"), root1)) shouldBe false
    assertSameRows(
      PartitionedLayout.read(spark, "pspec_rw").select("pk", "id"), df3)
  }
}
