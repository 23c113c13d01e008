package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first shortest path (hop distance) as a
  * frontier-iterated DataFrame loop — the reachability/distance member
  * of the engine's graph family next to connected components, PageRank
  * and triangle counting. Reference analogue: none (the reference has
  * no graph operators).
  *
  * Frontier discipline (the property that makes BFS viable at scale):
  * iteration h touches only the NEW nodes discovered at distance h-1,
  * never the settled set — so total work is O(Σ_h |frontier_h| ·
  * avg-degree) = O(|E|) across the whole run, not O(|E|) PER
  * iteration. The naive alternative (expand every (node, dist) pair
  * each round and min-aggregate at the end — which is exactly what a
  * recursive-CTE engine does, and what the q74 oracle does) re-visits
  * every settled node every round; on a graph whose BFS tree is deep
  * that is the difference between O(E) and O(E·diameter).
  *
  * Per iteration: ONE edge join keyed on src (the frontier is the
  * small side — broadcastable early on, AQE's call), one distinct on
  * the discovered set, one anti join against settled (both keyed on
  * node). localCheckpoint pins each round so lineage stays flat (the
  * q34 UnionLoop lesson); the loop exits early when a frontier is
  * empty, which never changes the result — it only skips provably
  * empty rounds.
  *
  * Determinism contract with the oracle: hop distances are integers,
  * so unlike PageRank there is no floating-point unroll discipline —
  * any engine that computes min hop distance agrees exactly.
  */
object ShortestPath {

  /** Min hop distance from any node in `seeds(node)` along DIRECTED
    * `edges(src, dst)`, bounded by `maxHops`. Undirected graphs pass
    * both orientations. Output: (node, dist) — seeds at 0 (isolated
    * seeds included; they are reachable at distance 0 by definition),
    * every node first discovered at hop h ≤ maxHops at h.
    */
  /** Bounded Bellman-Ford: min total WEIGHT from any seed along
    * DIRECTED `edges(src, dst, w)` over paths of at most `rounds`
    * edges — the weighted member next to [[hops]] (which is this with
    * w ≡ 1 plus the frontier optimization hop-distance admits; with
    * real weights a settled node can still improve, so every round
    * relaxes the full distance table — the textbook reason
    * Bellman-Ford is O(V·E) and BFS is O(E)). Fixed rounds is the
    * contract (like [[graft.operators.LabelPropagation]]): "shortest
    * path using at most k edges" is exact and engine-agnostic for any
    * k, converging to the true shortest path once k reaches the
    * longest shortest-path edge count. One keyed join + one min
    * aggregate per round; integer weights make results bit-equal with
    * the unrolled oracle.
    */
  def weighted(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val e = edges.select(col("src"), col("dst"), col("w"))
      .distinct().localCheckpoint()
    var dist = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    for (_ <- 1 to rounds) {
      val relaxed = e
        .join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    dist
  }

  def hops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    var settled = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint()
    var frontier = settled.select("node")
    var h = 1
    var exhausted = frontier.isEmpty
    while (h <= maxHops && !exhausted) {
      val discovered = e.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(settled, Seq("node"), "left_anti")
        .withColumn("dist", lit(h))
        .localCheckpoint()
      if (discovered.isEmpty) exhausted = true
      else {
        settled = settled.unionAll(discovered).localCheckpoint()
        frontier = discovered.select("node")
      }
      h += 1
    }
    settled
  }
}
