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
}
