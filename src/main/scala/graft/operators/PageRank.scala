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
  * the cost — [[IterPin]] pins each iteration so lineage stays
  * flat (the q34 UnionLoop lesson): localCheckpoint by default,
  * periodic RELIABLE checkpoints under
  * `graft.graph.reliableCheckpointEvery` for cluster mode, where a
  * lost executor's localCheckpoint blocks would kill the loop.
  */
object PageRank {

  /** (distinct edges, nodes, out-degrees, 1-row node count). */
  private def graphTables(edges: DataFrame, pin: IterPin)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val e = pin(edges.select(col("src"), col("dst")).distinct(), "edges")
    val nodes = pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct(), "nodes")
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nRow = nodes.agg(count(lit(1)).cast("double").as("n"))
    (e, nodes, outDeg, nRow)
  }

  /** One damped iteration (see class doc for the plan shape). */
  private def step(pr: DataFrame, e: DataFrame, nodes: DataFrame,
      outDeg: DataFrame, nRow: DataFrame, d: Double,
      pin: IterPin): DataFrame = {
    val withDeg = pr.join(outDeg, pr("node") === outDeg("src"), "left")
    // dangling mass: ranks of nodes with no out-edges
    val dm = withDeg.where(col("deg").isNull)
      .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
    val contrib = e
      .join(pr.withColumnRenamed("node", "src"), "src")
      .join(outDeg, "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(col("pr") / col("deg")).as("c"))
    pin(nodes
      .join(contrib, Seq("node"), "left")
      .crossJoin(broadcast(dm))
      .crossJoin(broadcast(nRow))
      .select(col("node"),
        ((lit(1.0) - d) / col("n") +
          lit(d) * (coalesce(col("c"), lit(0.0)) + col("dm") / col("n")))
          .as("pr")), "pr")
  }

  /** Ranks after `iters` iterations with damping `d` over directed
    * `edges(src, dst)`; nodes = every id appearing on either side.
    * Output: (node, pr) with pr rounded to 6 decimals. The uniform
    * start is built directly as 1/n per node (NOT through the
    * warm-start normalizer — q43's oracle unrolls this exact chain
    * bit-for-bit, and normalizing a uniform vector by its double-sum
    * would perturb the start by one ulp).
    */
  def ranks(spark: SparkSession, edges: DataFrame,
      iters: Int = 5, d: Double = 0.85): DataFrame = {
    val pin = IterPin.loop()
    val (e, nodes, outDeg, nRow) = graphTables(edges, pin)
    var pr = pin(nodes.crossJoin(broadcast(nRow))
      .select(col("node"), (lit(1.0) / col("n")).as("pr")), "pr")
    for (_ <- 1 to iters) pr = step(pr, e, nodes, outDeg, nRow, d, pin)
    pin.seal(pr.select(col("node"), round(col("pr"), 6).as("pr")))
  }

  /** Iterate to CONVERGENCE (L1 delta ≤ `tol`), optionally
    * WARM-STARTED from a previous rank vector — the graph-append
    * production path: on a grown graph the previous ranks are close
    * to the new fixpoint, so far fewer iterations reach the same
    * tolerance than the uniform cold start (spec-measured). `init`
    * rows are matched to the CURRENT node set: new nodes start at
    * 1/n, then the vector renormalizes to unit mass (PageRank's
    * invariant — the fixpoint is unique, so any normalized start
    * converges to the SAME ranks; warm starting changes the path,
    * never the destination). Returns (unrounded ranks, iterations
    * run). Fails loudly if `maxIters` rounds don't reach `tol` — an
    * unconverged vector served as "the ranks" would be silently
    * wrong, the DupClusters discipline.
    */
  def converged(spark: SparkSession, edges: DataFrame,
      init: Option[DataFrame] = None, tol: Double = 1e-9,
      maxIters: Int = 60, d: Double = 0.85): (DataFrame, Int) = {
    val pin = IterPin.loop()
    val (e, nodes, outDeg, nRow) = graphTables(edges, pin)
    var pr = init match {
      case None =>
        pin(nodes.crossJoin(broadcast(nRow))
          .select(col("node"), (lit(1.0) / col("n")).as("pr")), "pr")
      case Some(prev) =>
        val joined = pin(nodes
          .join(prev.select(col("node"), col("pr").as("_prev")), Seq("node"),
            "left")
          .crossJoin(broadcast(nRow))
          .select(col("node"),
            coalesce(col("_prev"), lit(1.0) / col("n")).as("pr")), "pr")
        val mass = joined.agg(sum("pr").as("m"))
        pin(joined.crossJoin(broadcast(mass))
          .select(col("node"), (col("pr") / col("m")).as("pr")), "pr")
    }
    var iters = 0
    var delta = Double.MaxValue
    while (delta > tol) {
      if (iters >= maxIters) throw new IllegalStateException(
        s"PageRank did not reach tol=$tol in $maxIters iterations " +
          s"(last L1 delta $delta) — raise maxIters or loosen tol")
      val next = step(pr, e, nodes, outDeg, nRow, d, pin)
      delta = next.join(pr.withColumnRenamed("pr", "_old"), "node")
        .agg(coalesce(sum(abs(col("pr") - col("_old"))), lit(0.0)))
        .head.getDouble(0)
      pr = next
      iters += 1
    }
    (pin.seal(pr), iters)
  }
}
