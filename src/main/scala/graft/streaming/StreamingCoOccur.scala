package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.CoOccurStore

/** The stored co-occurrence graph's INGEST as a stream — the
  * streaming sibling of `operators/CoOccurStore`: (group, item) rows
  * arrive continuously and every micro-batch lands its pair-count
  * DELTA PARTIAL (the same `post − pre over affected groups` algebra
  * — [[CoOccurStore.pairDeltaOf]], ONE shared implementation) as an
  * immutable `_batch=<id>` partition; the served edge counts are the
  * running sum. No streaming state store — like the other
  * screen/ingest streams, the SINK is the state, which is what keeps
  * restart semantics trivial:
  *
  *  - a replayed micro-batch recomputes the IDENTICAL delta (its
  *    pre-view reads only `_batch < id` partitions — deterministic
  *    under at-least-once replay) and dynamic partition overwrite
  *    replaces its own partition bit-for-bit;
  *  - a crash between the delta write and the gi write replays into
  *    the same partitions;
  *  - cross-batch pairs (a group's rows split across micro-batches —
  *    the same cross-generation problem the batch store solves) are
  *    exact: the delta is computed against the prior batches' rows of
  *    the AFFECTED groups (capped-In pushdown, distributed semi-join
  *    fallback — the batch store's gate discipline).
  *
  * Serving reads `sumPairs(partials) >= cut` — fold-at-read, the
  * house discipline; an offline compaction can collapse partials
  * exactly like the batch store's fold (partials are additive). All
  * path existence checks go through the Hadoop FileSystem of the
  * session (`outDir` may be hdfs://, s3a://, … — a java.nio check
  * would silently report false there and break the pre-view).
  */
object StreamingCoOccur {

  private def fsExists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Whether a written sink dir holds any parquet DATA (a batch whose
    * delta was empty writes only markers — `partitionBy` emits no
    * partition dir for zero rows).
    */
  private def hasParquet(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext)
        found = it.next().getPath.getName.endsWith(".parquet")
      found
    }
  }

  /** One micro-batch's delta against the prior batches — exposed for
    * the spec's replay-determinism checks.
    */
  private[streaming] def applyBatch(batch: DataFrame, batchId: Long,
      gCol: String, iCol: String, outDir: String): Unit = {
    val s = batch.sparkSession
    val gi = batch.select(col(gCol).as("g"), col(iCol).as("i"))
      .localCheckpoint()
    val giDir = s"$outDir/gi"
    val delta =
      if (hasParquet(s, giDir)) {
        val prior = s.read.parquet(giDir)
          .where(col("_batch") < batchId).select("g", "i")
        CoOccurStore.pairDeltaOf(gi, prior)
      } else CoOccurStore.pairCounts(gi)
    // delta first, rows second: a crash between the two replays the
    // batch and dynamic overwrite replaces both partitions
    delta.withColumn("_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch")
      .parquet(s"$outDir/pairparts")
    gi.withColumn("_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch")
      .parquet(giDir)
  }

  def start(rows: DataFrame, gCol: String, iCol: String,
      outDir: String, checkpoint: String, trigger: Trigger): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) applyBatch(batch, batchId, gCol, iCol, outDir)
        ()
      }
      .start()

  /** The served edge counts: running sum of the delta partials at the
    * caller's cut (serve-side threshold, one sink serves every cut).
    * A sink whose batches produced no pairs yet serves EMPTY — typed
    * from the ingested (g, i) rows — instead of failing schema
    * inference on a data-less directory; with no ingested batch at
    * all it refuses with the actual cause.
    */
  def weightedEdges(spark: SparkSession, outDir: String,
      minCount: Long): DataFrame = {
    val pp = s"$outDir/pairparts"
    if (hasParquet(spark, pp))
      spark.read.parquet(pp).drop("_batch")
        .groupBy("a", "b").agg(sum("n").as("n"))
        .where(col("n") >= minCount)
    else if (hasParquet(spark, s"$outDir/gi")) {
      // batches ingested, zero pairs so far (single-item groups):
      // an empty edge set typed like the items
      val i = spark.read.parquet(s"$outDir/gi").select("i")
      i.select(col("i").as("a"), col("i").as("b"),
        lit(0L).as("n")).limit(0)
    } else throw new IllegalStateException(
      s"no ingested co-occurrence batches under $outDir — start the " +
        "stream (or point at its outDir) before serving edges")
  }
}
