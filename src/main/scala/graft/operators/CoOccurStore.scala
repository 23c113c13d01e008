package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.{MergePiece, Piece}

/** Stored, incrementally-maintained co-occurrence graph: canonical
  * (a < b) edge counts over (group, item) rows — items adjacent when
  * they appear in the same group, weighted by how many groups share
  * them. This is the edge list the graph family (BFS / k-core / label
  * propagation) and any market-basket screen consumes; without the
  * store every query re-pays the full pair-generation exchange over
  * the whole corpus, which at 100 TB is the dominant cost of ANY
  * graph question.
  *
  * Why this is a [[MergePiece]] and not an additive piece — the
  * cross-generation group problem: a group's rows may arrive across
  * MANY corpus increments (an order's lineitems split over files), so
  * pairs computed per generation would miss every pair whose two
  * members arrived in different generations. The advance therefore
  * recomputes the pair counts of only the AFFECTED groups (groups
  * named by the increment) against the pre-increment stored rows,
  * and upserts `stored_n − pre_n + post_n` per touched edge —
  * O(increment + affected groups' rows), never O(corpus). Appends
  * only add distinct (group, item) rows, so counts only grow and the
  * touched-edge set is exactly `post_n > pre_n`.
  *
  * Pieces:
  *  - `gi` (ADDITIVE): the raw 2-column (g, i) projection per corpus
  *    file — the advance's source for pre-increment rows of affected
  *    groups (folded clustered by g, so that filter prunes row
  *    groups). Deliberately NOT distinct: per-file distinct is not
  *    additive when duplicates span files; distinct is applied where
  *    pairs are computed.
  *  - `edges` (KEYED UPSERT on (a, b)): the co-occurrence counts.
  *
  * Chunking invariance (the lazy-merge contract): one advance over k
  * appended file sets recomputes affected groups against the same
  * final corpus state as k chained advances — both end at the true
  * whole-corpus counts per edge.
  */
object CoOccurStore {

  private def pairCounts(gi: DataFrame): DataFrame =
    graft.dedup.PairGen.pairsWithin(gi.distinct(), Seq("g"), col("i"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))

  private def handle(corpusPath: String, groupCol: String, itemCol: String) = {
    def gi(docs: DataFrame): DataFrame =
      docs.select(col(groupCol).as("g"), col(itemCol).as("i"))
    IncrementalDocArtifact(corpusPath, s"cooc_${groupCol}_$itemCol",
      Seq(Piece("gi", (docs, _) => gi(docs),
        fold = Some(_.repartition(col("g")).sortWithinPartitions("g", "i")))),
      Seq(MergePiece("edges", Seq("a", "b"),
        buildFull = (docs, _) => pairCounts(gi(docs)),
        advance = { ctx =>
          val inc = gi(ctx.newDocs)
          val affected = inc.select("g").distinct()
          // pre-increment rows of the affected groups only — the
          // stored view excludes the generations being written
          val pre = ctx.stored("gi")
            .join(affected, Seq("g"), "left_semi")
          val preN = pairCounts(pre)
            .withColumnRenamed("n", "pre_n")
          val postN = pairCounts(pre.unionByName(inc))
          // appends only grow distinct (g,i): post covers pre's keys
          val delta = postN.join(preN, Seq("a", "b"), "left")
            .where(col("pre_n").isNull || col("n") > col("pre_n"))
            .select(col("a"), col("b"),
              (col("n") - coalesce(col("pre_n"), lit(0L))).as("dn"))
          delta.join(ctx.stored("edges")
              .select(col("a"), col("b"), col("n").as("old_n")),
              Seq("a", "b"), "left")
            .select(col("a"), col("b"),
              (coalesce(col("old_n"), lit(0L)) + col("dn")).as("n"))
        })),
      compactEvery = 8)
  }

  /** Stored canonical (a, b) edges of `table`'s (groupCol, itemCol)
    * co-occurrence graph with count >= minCount — built on first use,
    * advanced O(new + affected groups) when the corpus grows. The
    * threshold is a serve-side filter, so one stored artifact serves
    * every consumer regardless of its cut.
    */
  def edges(spark: SparkSession, sfDir: String, table: String,
      groupCol: String, itemCol: String, minCount: Long): DataFrame =
    weightedEdges(spark, sfDir, table, groupCol, itemCol, minCount)
      .select("a", "b")

  /** As [[edges]] but keeping the co-occurrence count `n` — the edge
    * weight for the weighted-distance family.
    */
  def weightedEdges(spark: SparkSession, sfDir: String, table: String,
      groupCol: String, itemCol: String, minCount: Long): DataFrame =
    handle(s"$sfDir/$table.parquet", groupCol, itemCol)
      .serve(spark, "edges")
      .where(col("n") >= minCount)

  /** Offline compaction hook. */
  def compact(spark: SparkSession, corpusPath: String,
      groupCol: String, itemCol: String): Unit =
    handle(corpusPath, groupCol, itemCol).compact(spark)
}
