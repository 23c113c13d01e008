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

  /** Loop-invariant graph tables, each pinned ONCE: distinct edges,
    * nodes, out-degrees, the dangling node set (no out-edges) and the
    * 1-row node count. Before round 16 `outDeg`/`nRow` were plain
    * derived frames recomputed inside EVERY iteration's plan (outDeg
    * twice per round — once under the dangling-mass subquery, once
    * under the contribution join) and the dangling set was re-derived
    * per round as a left join + isNull filter; pinning them here takes
    * the per-iteration plan from 2 aggregations + 1 left join of
    * invariants down to zero (guide §2.4: don't recompute what a
    * previous pass already established).
    */
  private def graphTables(edges: DataFrame, pin: IterPin)
      : (DataFrame, DataFrame, DataFrame, DataFrame, Double) = {
    val e = pin(edges.select(col("src"), col("dst")).distinct(), "edges")
    val nodes = pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct(), "nodes")
    val outDeg = pin(e.groupBy("src").agg(count(lit(1)).as("deg")), "deg")
    val dangling = pin(nodes.join(outDeg,
      nodes("node") === outDeg("src"), "left_anti"), "dangling")
    // node count as a driver scalar: one count job over the pinned
    // node table; identical value to the old 1-row count(*) aggregate
    val n = nodes.count().toDouble
    (e, nodes, outDeg, dangling, n)
  }

  /** One damped iteration (see class doc for the plan shape).
    *
    * The loop-invariant node count rides as a LITERAL (computed once,
    * not re-aggregated + broadcast per iteration); the dangling mass
    * stays a broadcast crossJoin — an r16 experiment replaced it with
    * a driver `head` literal and measured WORSE (5.5 s vs 4.8 s
    * isolated q43: the BroadcastExchange build overlaps with the pin
    * job's other stages, a strictly-serial head() cannot).
    */
  private def step(pr: DataFrame, e: DataFrame, nodes: DataFrame,
      outDeg: DataFrame, dangling: DataFrame, n: Double, d: Double,
      pin: IterPin): DataFrame = {
    // dangling mass: ranks of nodes with no out-edges — the summed SET
    // is identical to the pre-r16 left-join/isNull form (semi join
    // against the pinned dangling table); the final round(6) absorbs
    // double-summation order, the class-doc determinism argument.
    val dm = pr.join(dangling, Seq("node"), "left_semi")
      .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
    val contrib = e
      .join(pr.withColumnRenamed("node", "src"), "src")
      .join(outDeg, "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(col("pr") / col("deg")).as("c"))
    pin(nodes
      .join(contrib, Seq("node"), "left")
      .crossJoin(broadcast(dm))
      .select(col("node"),
        ((lit(1.0) - d) / lit(n) +
          lit(d) * (coalesce(col("c"), lit(0.0)) + col("dm") / lit(n)))
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
    val (e, nodes, outDeg, dangling, n) = graphTables(edges, pin)
    var pr = pin(nodes
      .select(col("node"), (lit(1.0) / lit(n)).as("pr")), "pr")
    for (_ <- 1 to iters)
      pr = step(pr, e, nodes, outDeg, dangling, n, d, pin)
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
    val (e, nodes, outDeg, dangling, n) = graphTables(edges, pin)
    var pr = init match {
      case None =>
        pin(nodes
          .select(col("node"), (lit(1.0) / lit(n)).as("pr")), "pr")
      case Some(prev) =>
        val joined = pin(nodes
          .join(prev.select(col("node"), col("pr").as("_prev")), Seq("node"),
            "left")
          .select(col("node"),
            coalesce(col("_prev"), lit(1.0) / lit(n)).as("pr")), "pr")
        // coalesce: sum over zero rows is null — an empty graph with a
        // warm-start init must degrade to an empty frame, not NPE here
        val mass = joined.agg(coalesce(sum("pr"), lit(1.0)).as("m"))
          .head.getDouble(0)
        pin(joined
          .select(col("node"), (col("pr") / lit(mass)).as("pr")), "pr")
    }
    var iters = 0
    var delta = Double.MaxValue
    while (delta > tol) {
      if (iters >= maxIters) throw new IllegalStateException(
        s"PageRank did not reach tol=$tol in $maxIters iterations " +
          s"(last L1 delta $delta) — raise maxIters or loosen tol")
      val next = step(pr, e, nodes, outDeg, dangling, n, d, pin)
      delta = next.join(pr.withColumnRenamed("pr", "_old"), "node")
        .agg(coalesce(sum(abs(col("pr") - col("_old"))), lit(0.0)))
        .head.getDouble(0)
      pr = next
      iters += 1
    }
    (pin.seal(pr), iters)
  }
}
