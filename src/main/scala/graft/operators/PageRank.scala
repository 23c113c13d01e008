package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank (Brin & Page 1998) as a fixed-iteration DataFrame loop —
  * the iterative-join graph workload beyond connected components:
  * each iteration is ONE edge-keyed join (rank mass flows along
  * edges, divided by out-degree), one destination-keyed aggregate,
  * and one broadcast scalar for the dangling mass (nodes with no
  * out-edges redistribute uniformly — without this term a bipartite
  * graph drains to the teleport floor). No driver-side collection:
  * the dangling mass rides as a crossJoin(broadcast(1-row agg)),
  * the same discipline as the engine's other scalar aggregates.
  *
  * Determinism contract (the oracle unrolls the same chain as CTE
  * stages): fixed iteration count, the damping/teleport constants
  * appear as the SAME literals in both engines, every per-node
  * formula is written with identical parenthesization, and only the
  * FINAL ranks round (iteration values stay full-precision; the
  * per-aggregate double-summation jitter is ~1e-16 per step and the
  * final round(6) absorbs it).
  *
  * Scale: per iteration the only corpus-sized exchanges are the
  * edge join (keyed on src) and the contribution aggregate (keyed on
  * dst, map-side combined); rank state is |nodes| rows. The loop is
  * the cost — localCheckpoint pins each iteration so lineage stays
  * flat (the q34 UnionLoop lesson).
  */
object PageRank {

  /** Ranks after `iters` iterations with damping `d` over directed
    * `edges(src, dst)`; nodes = every id appearing on either side.
    * Output: (node, pr) with pr rounded to 6 decimals.
    */
  def ranks(spark: SparkSession, edges: DataFrame,
      iters: Int = 5, d: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nRow = nodes.agg(count(lit(1)).cast("double").as("n"))
    var pr = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), (lit(1.0) / col("n")).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val withDeg = pr.join(outDeg, pr("node") === outDeg("src"), "left")
      // dangling mass: ranks of nodes with no out-edges
      val dm = withDeg.where(col("deg").isNull)
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
      val contrib = e
        .join(pr.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("deg")).as("c"))
      pr = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dm))
        .crossJoin(broadcast(nRow))
        .select(col("node"),
          ((lit(1.0) - d) / col("n") +
            lit(d) * (coalesce(col("c"), lit(0.0)) + col("dm") / col("n")))
            .as("pr"))
        .localCheckpoint()
    }
    pr.select(col("node"), round(col("pr"), 6).as("pr"))
  }
}
