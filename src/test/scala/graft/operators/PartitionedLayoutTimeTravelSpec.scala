package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Time travel on the layout committer: every commit lands an
  * immutable history manifest, appends never delete data files (so an
  * append-only table is travelable to the original build for free),
  * the `graft.layout.retainVersions` knob extends the reach across
  * retracts/rewrites, vacuum reclaims the deferred space, and the
  * version-salted gen ids keep a retract-then-identical-reappend from
  * clobbering files a retained history version still serves.
  */
class PartitionedLayoutTimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def newSource(tag: String): String =
    Files.createTempDirectory(s"graft-ptt-$tag")
      .resolve("src.parquet").toString

  /** Version assertions are absolute, so the table must start from
    * nothing — the artifact store persists across JVM runs and a
    * prior run's manifests would shift every version number.
    */
  private def fresh(table: String): String = {
    val root = Paths.get(
      s"${graft.sources.ArtifactStore.root}/partitioned/$table")
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

  private def ensure(src: String, table: String): Unit =
    PartitionedLayout.ensureIncremental(spark, src, table, "pk", identity)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  private def withRetain[T](n: Int)(body: => T): T = {
    val prev = sys.props.get("graft.layout.retainVersions")
    sys.props("graft.layout.retainVersions") = n.toString
    try body
    finally prev match {
      case Some(v) => sys.props("graft.layout.retainVersions") = v
      case None => sys.props -= "graft.layout.retainVersions"
    }
  }

  test("append-only tables are travelable to every version for free") {
    val src = newSource("appendonly")
    fresh("ptt_a")
    append(src, 1, 40); ensure(src, "ptt_a") // v1
    append(src, 41, 50); ensure(src, "ptt_a") // v2
    append(src, 51, 60); ensure(src, "ptt_a") // v3
    PartitionedLayout.versions("ptt_a") shouldBe Seq(1L, 2L, 3L)
    ids(PartitionedLayout.readVersion(spark, "ptt_a", 1)) shouldBe
      (1L to 40L).toSet
    ids(PartitionedLayout.readVersion(spark, "ptt_a", 2)) shouldBe
      (1L to 50L).toSet
    // the live version serves identically through both doors
    ids(PartitionedLayout.readVersion(spark, "ptt_a", 3)) shouldBe
      ids(PartitionedLayout.read(spark, "ptt_a"))
    val e = intercept[IllegalArgumentException](
      PartitionedLayout.readVersion(spark, "ptt_a", 99))
    e.getMessage should include("available: 1, 2, 3")
    // a historical read still prunes directories at planning time
    val q = PartitionedLayout.readVersion(spark, "ptt_a", 2)
      .where(col("pk") === 3)
    q.collect()
    q.queryExecution.executedPlan.toString should
      include regex "PartitionFilters: \\[.*pk"
  }

  test("default retention: retract reclaims its gen; older versions stay") {
    val src = newSource("retr")
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
    fresh("ptt_r")
    append(src, 1, 40); ensure(src, "ptt_r") // v1
    val base = srcFiles()
    append(src, 41, 50); ensure(src, "ptt_r") // v2
    (srcFiles() -- base).foreach(Files.delete)
    ensure(src, "ptt_r") // v3: retract of the v2 increment
    ids(PartitionedLayout.read(spark, "ptt_r")) shouldBe (1L to 40L).toSet
    // v2's gen files are gone at retain=1 — refuse with the cause
    val e = intercept[IllegalStateException](
      PartitionedLayout.readVersion(spark, "ptt_r", 2))
    e.getMessage should include("garbage-collected past retention")
    // v1 referenced only the original build files, which the retract
    // never touched — still travelable
    ids(PartitionedLayout.readVersion(spark, "ptt_r", 1)) shouldBe
      (1L to 40L).toSet
  }

  test("raised retention serves across a retract; vacuum reclaims it") {
    withRetain(2) {
      val src = newSource("keep2")
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
      fresh("ptt_k")
    append(src, 1, 40); ensure(src, "ptt_k") // v1
      val base = srcFiles()
      append(src, 41, 50); ensure(src, "ptt_k") // v2
      (srcFiles() -- base).foreach(Files.delete)
      ensure(src, "ptt_k") // v3 retract — retain=2 keeps v2's files
      ids(PartitionedLayout.read(spark, "ptt_k")) shouldBe (1L to 40L).toSet
      ids(PartitionedLayout.readVersion(spark, "ptt_k", 2)) shouldBe
        (1L to 50L).toSet
      // vacuum to the live version only: the deferred files go now
      val deleted = PartitionedLayout.vacuum("ptt_k", keepLast = 1)
      assert(deleted > 0, "vacuum reclaimed nothing")
      val e = intercept[Exception](
        PartitionedLayout.readVersion(spark, "ptt_k", 2))
      // either the history manifest is pruned (IllegalArgument) or the
      // files are gone (IllegalState) — both are a clean refusal
      e.getMessage should (include("no version 2") or
        include("garbage-collected past retention"))
      // the live layout is untouched by vacuum
      ids(PartitionedLayout.read(spark, "ptt_k")) shouldBe (1L to 40L).toSet
    }
  }

  test("vacuum on an append-only table deletes nothing") {
    val src = newSource("noop")
    fresh("ptt_n")
    append(src, 1, 40); ensure(src, "ptt_n")
    append(src, 41, 50); ensure(src, "ptt_n")
    PartitionedLayout.vacuum("ptt_n", keepLast = 1) shouldBe 0
    ids(PartitionedLayout.read(spark, "ptt_n")) shouldBe (1L to 50L).toSet
    // history manifests beyond keepLast are pruned, the rest remain
    PartitionedLayout.versions("ptt_n") shouldBe Seq(2L)
  }

  test("rewrite: the grace-window root keeps the prior version travelable one rewrite") {
    val src = newSource("rw")
    (1L to 40L).map(i => (i % 4, i)).toDF("pk", "id")
      .coalesce(1).write.mode("overwrite").parquet(src)
    fresh("ptt_w")
    ensure(src, "ptt_w") // v1
    (101L to 140L).map(i => (i % 4, i)).toDF("pk", "id")
      .coalesce(1).write.mode("overwrite").parquet(src)
    ensure(src, "ptt_w") // v2: rewrite; v1's root survives as grace
    ids(PartitionedLayout.readVersion(spark, "ptt_w", 1)) shouldBe
      (1L to 40L).toSet
    (201L to 240L).map(i => (i % 4, i)).toDF("pk", "id")
      .coalesce(1).write.mode("overwrite").parquet(src)
    ensure(src, "ptt_w") // v3: v1's root is GC'd at retain=1
    val e = intercept[IllegalStateException](
      PartitionedLayout.readVersion(spark, "ptt_w", 1))
    e.getMessage should include("garbage-collected past retention")
    ids(PartitionedLayout.readVersion(spark, "ptt_w", 2)) shouldBe
      (101L to 140L).toSet
  }

  test("retract-then-identical-reappend cannot clobber a retained gen") {
    withRetain(3) {
      val src = newSource("salt")
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
      fresh("ptt_s")
    append(src, 1, 40); ensure(src, "ptt_s") // v1
      val base = srcFiles()
      append(src, 41, 50); ensure(src, "ptt_s") // v2
      val incr = (srcFiles() -- base).toSeq
      // stash the increment byte-for-byte WITH its mtime, so the
      // re-append below reproduces the identical ledger entries (the
      // backup-restore scenario)
      val stash = Files.createTempDirectory("graft-ptt-stash")
      val saved = incr.map { f =>
        val t = stash.resolve(f.getFileName)
        Files.copy(f, t)
        (t, f, Files.getLastModifiedTime(f))
      }
      incr.foreach(Files.delete)
      ensure(src, "ptt_s") // v3 retract; retain=3 keeps v2's files
      saved.foreach { case (t, orig, mtime) =>
        Files.copy(t, orig)
        Files.setLastModifiedTime(orig, mtime)
      }
      ensure(src, "ptt_s") // v4: identical entries re-appended
      // the re-append's replay sweep must NOT have deleted the files
      // v2 still references (version-salted gen ids make them distinct)
      ids(PartitionedLayout.readVersion(spark, "ptt_s", 2)) shouldBe
        (1L to 50L).toSet
      ids(PartitionedLayout.read(spark, "ptt_s")) shouldBe (1L to 50L).toSet
    }
  }
}
