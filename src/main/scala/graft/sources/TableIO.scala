package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage abstraction fronting one "store" of a sync pair.
  *
  * The reference talks to live Cassandra / Elasticsearch
  * (pyCassElastic.py:172-186); this build is zero-egress, so the
  * shipped implementation is parquet snapshots — but every operator
  * only ever sees DataFrames, so a connector-backed TableIO
  * (cassandra DSv2 / es-hadoop) drops in without touching the engine.
  *
  * Writes are two-phase (`prepare` materializes, `Prepared.commit`
  * publishes) so a bidirectional sync can stage BOTH legs' outputs —
  * each computed from both stores' OLD state — before either store is
  * swapped. Single-phase `overwrite` is prepare+commit.
  */
trait TableIO {
  def read(spark: SparkSession): DataFrame
  def exists: Boolean
  def prepare(df: DataFrame): TableIO.Prepared
  final def overwrite(df: DataFrame): Unit = prepare(df).commit()
}

object TableIO {
  trait Prepared { def commit(): Unit; def abort(): Unit }
}

/** Parquet snapshot store with transactional replace.
  *
  * Write protocol: materialize the new snapshot into a sibling
  * `.staging` dir (readers keep seeing the old data — which also lets
  * the new snapshot be computed FROM the old one; Spark's own
  * Overwrite truncates before reading), then swap directories with a
  * rollback guard. This is the engine's equivalent of the reference's
  * duplication guard — abort the leg rather than leave a half-applied
  * state (pyCassElastic.py:85-88).
  *
  * `partitionBy`: a date-derived column here turns the incremental
  * window scan into partition pruning — the reference's own
  * acknowledged redesign ("partition the data by day",
  * reference README.md:21,77). At 100 TB this is the difference
  * between a full scan and reading one day's partitions.
  */
final class ParquetTableIO(val path: String, partitionBy: Seq[String] = Nil,
    derive: DataFrame => DataFrame = identity)
    extends TableIO {

  private def p: Path = Paths.get(path)

  override def exists: Boolean = Files.exists(p)

  override def read(spark: SparkSession): DataFrame = spark.read.parquet(path)

  override def prepare(df: DataFrame): TableIO.Prepared = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".staging")
    val old = p.resolveSibling(p.getFileName.toString + ".old")
    deleteTree(tmp); deleteTree(old)
    val w = derive(df).write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)
    new TableIO.Prepared {
      override def commit(): Unit = {
        if (Files.exists(p)) Files.move(p, old)
        try Files.move(tmp, p)
        catch { case e: Throwable => // roll back so readers still see old data
          if (Files.exists(old)) Files.move(old, p)
          throw e
        }
        deleteTree(old)
      }
      override def abort(): Unit = deleteTree(tmp)
    }
  }

  private def deleteTree(dir: Path): Unit =
    if (Files.exists(dir))
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}

object ParquetTableIO {

  /** Day-partitioned layout — the reference's acknowledged redesign
    * ("partition the data by day", reference README.md:21,77) made
    * real: every snapshot write derives `dayCol` from the epoch-millis
    * version column and lays files out `dayCol=YYYY-MM-DD/`. Pair with
    * `IncrementalScan(..., dayCol = Some(dayCol))` so the half-open
    * window lists and reads ONLY its days — at 100 TB the difference
    * between a full scan and one day's partitions per tick.
    */
  def dayPartitioned(path: String, versionCol: String,
      dayCol: String = "_day"): ParquetTableIO = {
    import org.apache.spark.sql.functions.{col, timestamp_millis, to_date}
    new ParquetTableIO(path, partitionBy = Seq(dayCol),
      derive = df => df.withColumn(dayCol,
        to_date(timestamp_millis(col(versionCol)))))
  }
}
