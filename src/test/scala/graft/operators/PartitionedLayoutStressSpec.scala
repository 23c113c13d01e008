package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{ArtifactStore, WriterLease}

/** The 16th randomized differential family — layout-maintenance parity:
  * seeded random op sequences (small append / new-partition append /
  * wholesale source rewrite / stale-lease debris) against
  * [[PartitionedLayout.ensureIncremental]], asserting after EVERY op
  * that the layout read equals the derive over a flat scan of the
  * source, row for row. The manifest commit protocol, the append
  * re-cluster path, the rewrite GC/grace-window, the staging sweep and
  * the lease takeover are all load-bearing for this to hold.
  */
class PartitionedLayoutStressSpec extends SparkSpec {
  import spark.implicits._

  private def deleteTree(dir: Path): Unit =
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }

  test("seeded append/rewrite/debris sequences: layout read equals flat derive after every op") {
    for (seed <- Seq(11, 42)) {
      val rnd = new scala.util.Random(seed)
      val table = s"pstress_$seed"
      val src = Files.createTempDirectory(s"graft-pstress-$seed")
        .resolve("src.parquet").toString
      val tableRoot = Paths.get(s"${ArtifactStore.root}/partitioned/$table")
      deleteTree(tableRoot)
      val derive = (df: org.apache.spark.sql.DataFrame) =>
        df.withColumn("pk", pmod(col("id"), lit(4L)))

      var next = 0L
      def rows(n: Int): Seq[(Long, String)] =
        (0 until n).map { _ => val r = (next, s"v$next"); next += 1; r }

      // op 0 must create the source
      rows(20).toDF("id", "v").coalesce(1).write.parquet(src)
      def srcFiles(): Set[Path] = {
        val s = Files.list(Paths.get(src))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter { f =>
            val n = f.getFileName.toString
            !(n.startsWith("_") || n.startsWith("."))
          }.toSet
        } finally s.close()
      }
      val batches = scala.collection.mutable.ArrayBuffer[Set[Path]]()

      for (step <- 1 to 12) {
        rnd.nextInt(5) match {
          case 0 => // small append into existing partitions
            val before = srcFiles()
            rows(5 + rnd.nextInt(10)).toDF("id", "v")
              .coalesce(1).write.mode("append").parquet(src)
            batches += (srcFiles() -- before)
          case 1 => // larger append (multiple files)
            val before = srcFiles()
            rows(30).toDF("id", "v")
              .repartition(2).write.mode("append").parquet(src)
            batches += (srcFiles() -- before)
          case 2 => // wholesale source rewrite — layout must re-lay out
            rows(15 + rnd.nextInt(10)).toDF("id", "v")
              .coalesce(1).write.mode("overwrite").parquet(src)
            batches.clear()
          case 3 => // crashed-foreign-writer debris before the ensure
            graft.TestLeases.plantStale(tableRoot, s"99999-pstress$seed")
          case 4 if batches.nonEmpty => // RETRACT the latest batch:
            // whole-increment removals retract O(dropped), anything
            // unaligned re-lays out — parity must hold either way
            batches.remove(batches.size - 1)
              .foreach(Files.deleteIfExists(_))
          case _ => () // retract with nothing appended: no-op step
        }
        PartitionedLayout.ensureIncremental(spark, src, table, "pk", derive)
        withClue(s"seed=$seed step=$step: ") {
          assertSameRows(
            PartitionedLayout.read(spark, table).select("id", "v", "pk"),
            derive(spark.read.parquet(src)).select("id", "v", "pk"))
        }
        // idempotent re-ensure serves without re-work and stays equal
        PartitionedLayout.ensureIncremental(spark, src, table, "pk", derive)
        withClue(s"seed=$seed step=$step re-ensure: ") {
          assertSameRows(
            PartitionedLayout.read(spark, table).select("id", "v", "pk"),
            derive(spark.read.parquet(src)).select("id", "v", "pk"))
        }
      }
      deleteTree(tableRoot)
      deleteTree(Paths.get(src).getParent)
    }
  }

  /** Time-travel parity under the same seeded op mix plus random
    * vacuums and retention settings. THE invariant (stronger than
    * "travelable versions exist"): a historical read either serves
    * EXACTLY the source state its version committed, or refuses with
    * one of the two documented exceptions — it never serves wrong
    * rows, no matter which retracts/rewrites/vacuums ran in between.
    * The live version must always serve.
    */
  test("seeded sequences: every servable version equals its recorded snapshot") {
    for ((seed, retain) <- Seq((7, 1), (23, 2), (99, 3))) {
      val prev = sys.props.get("graft.layout.retainVersions")
      sys.props("graft.layout.retainVersions") = retain.toString
      try {
        val rnd = new scala.util.Random(seed)
        val table = s"pttstress_$seed"
        val src = Files.createTempDirectory(s"graft-pttstress-$seed")
          .resolve("src.parquet").toString
        val tableRoot = Paths.get(s"${ArtifactStore.root}/partitioned/$table")
        deleteTree(tableRoot)
        val derive = (df: org.apache.spark.sql.DataFrame) =>
          df.withColumn("pk", pmod(col("id"), lit(4L)))

        var next = 0L
        def rows(n: Int): Seq[(Long, String)] =
          (0 until n).map { _ => val r = (next, s"v$next"); next += 1; r }
        rows(20).toDF("id", "v").coalesce(1).write.parquet(src)
        def srcFiles(): Set[Path] = {
          val s = Files.list(Paths.get(src))
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.filter { f =>
              val n = f.getFileName.toString
              !(n.startsWith("_") || n.startsWith("."))
            }.toSet
          } finally s.close()
        }
        val batches = scala.collection.mutable.ArrayBuffer[Set[Path]]()
        val snapshots = scala.collection.mutable.Map[Long, Set[Long]]()
        def idsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
          df.select("id").collect().map(_.getLong(0)).toSet

        for (step <- 1 to 12) {
          rnd.nextInt(6) match {
            case 0 =>
              val before = srcFiles()
              rows(5 + rnd.nextInt(10)).toDF("id", "v")
                .coalesce(1).write.mode("append").parquet(src)
              batches += (srcFiles() -- before)
            case 1 =>
              rows(15 + rnd.nextInt(10)).toDF("id", "v")
                .coalesce(1).write.mode("overwrite").parquet(src)
              batches.clear()
            case 2 if batches.nonEmpty =>
              batches.remove(batches.size - 1).foreach(Files.deleteIfExists(_))
            case 3 =>
              PartitionedLayout.vacuum(table, keepLast = 1 + rnd.nextInt(2))
            case _ => ()
          }
          PartitionedLayout.ensureIncremental(spark, src, table, "pk", derive)
          val live = PartitionedLayout.versions(table).max
          snapshots(live) = idsOf(derive(spark.read.parquet(src)))
          snapshots.foreach { case (ver, snap) =>
            try {
              val got = idsOf(PartitionedLayout.readVersion(spark, table, ver))
              withClue(s"seed=$seed step=$step version=$ver: ")(
                got shouldBe snap)
            } catch {
              case e @ (_: IllegalStateException
                  | _: IllegalArgumentException) =>
                withClue(s"seed=$seed step=$step: LIVE version $live " +
                  s"refused: $e")(assert(ver != live))
            }
          }
        }
        deleteTree(tableRoot)
        deleteTree(Paths.get(src).getParent)
      } finally prev match {
        case Some(v) => sys.props("graft.layout.retainVersions") = v
        case None => sys.props -= "graft.layout.retainVersions"
      }
    }
  }
}
