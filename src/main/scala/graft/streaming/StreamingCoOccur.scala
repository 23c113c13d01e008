package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The stored co-occurrence graph's INGEST as a stream — the
  * streaming sibling of `operators/CoOccurStore`: (group, item) rows
  * arrive continuously and every micro-batch lands its pair-count
  * DELTA PARTIAL (the same `post − pre over affected groups` algebra)
  * as an immutable `_batch=<id>` partition; the served edge counts
  * are the running sum. No streaming state store — like the other
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
  * exactly like the batch store's fold (partials are additive).
  */
object StreamingCoOccur {

  private def pairCounts(gi: DataFrame): DataFrame =
    graft.dedup.PairGen.pairsWithin(gi.distinct(), Seq("g"), col("i"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))

  /** One micro-batch's delta against the prior batches — exposed for
    * the spec's replay-determinism checks.
    */
  private[streaming] def applyBatch(batch: DataFrame, batchId: Long,
      gCol: String, iCol: String, outDir: String): Unit = {
    val s = batch.sparkSession
    val gi = batch.select(col(gCol).as("g"), col(iCol).as("i"))
      .localCheckpoint()
    val giDir = s"$outDir/gi"
    val pre0: Option[DataFrame] =
      if (Files.exists(Paths.get(giDir)))
        Some(s.read.parquet(giDir).where(col("_batch") < batchId)
          .select("g", "i"))
      else None
    val delta = pre0 match {
      case None => pairCounts(gi)
      case Some(prior) =>
        val affected = gi.select("g").distinct()
        val cap = 10000
        val gs = affected.limit(cap + 1).collect().map(_.get(0))
        val pre = (if (gs.length <= cap)
            prior.where(col("g").isInCollection(gs.toSeq))
          else prior.join(affected, Seq("g"), "left_semi"))
          .localCheckpoint()
        val preN = pairCounts(pre).withColumnRenamed("n", "pre_n")
        pairCounts(pre.unionByName(gi))
          .join(preN, Seq("a", "b"), "left")
          .where(col("pre_n").isNull || col("n") > col("pre_n"))
          .select(col("a"), col("b"),
            (col("n") - coalesce(col("pre_n"), lit(0L))).as("n"))
    }
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
    */
  def weightedEdges(spark: SparkSession, outDir: String,
      minCount: Long): DataFrame =
    spark.read.parquet(s"$outDir/pairparts").drop("_batch")
      .groupBy("a", "b").agg(sum("n").as("n"))
      .where(col("n") >= minCount)
}
