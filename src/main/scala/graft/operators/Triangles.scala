package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, lit, when}

/** Exact triangle counting by degree-ordered edge orientation (Suri &
  * Vassilvitskii, "Counting Triangles and the Curse of the Last
  * Reducer", WWW'11). The naive triple self-join enumerates every
  * wedge at every corner — 3× the work, and a hub key receives deg²
  * wedges in a single join partition (the "last reducer"). Orienting
  * each edge from its (degree, id)-smaller endpoint fixes both at
  * once: every triangle is counted exactly once, at its rank-min
  * corner (the one node with out-edges to the other two), and wedge
  * generation is bounded by Σ outdeg² = O(m^1.5) total — a hub has
  * almost no OUT-edges under the orientation, so its wedges vanish
  * instead of melting one task.
  *
  * Reference analogue: none (the reference has no graph operators);
  * third member of the engine's graph family next to connected
  * components and PageRank.
  */
object Triangles {

  /** Count triangles of an undirected simple graph given as CANONICAL
    * edges — one row per edge with `a < b`, no duplicates (the caller
    * owns dedup; a multigraph input multiplies counts). Returns one
    * row (n_triangles).
    */
  def count(edges: DataFrame): DataFrame = {
    val co = edges.select("a", "b")
    val deg = co.select(col("a").as("node"))
      .unionAll(co.select(col("b").as("node")))
      .groupBy("node").agg(F.count(lit(1)).as("deg"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = co
      .join(deg.toDF("a", "da"), "a")
      .join(deg.toDF("b", "db"), "b")
      .select(when(lowFirst, col("a")).otherwise(col("b")).as("u"),
        when(lowFirst, col("b")).otherwise(col("a")).as("v"))
    // wedges at the rank-min anchor; the out-neighbor pair is
    // id-canonical (v < w), matching the input's a < b — closed by a
    // semi join against the edge set
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.v").as("a"), col("e2.v").as("b"))
    wedges.join(co, Seq("a", "b"), "left_semi")
      .agg(F.count(lit(1)).as("n_triangles"))
  }

  /** Per-node triangle participation over the same CANONICAL edge
    * input — each closed triangle credits all three corners. Same
    * degree-ordered orientation and Σ outdeg² = O(m^1.5) wedge bound
    * as [[count]]; the closure keeps the wedge anchor (an inner join
    * against the edge set instead of the semi), then one explode +
    * one node-keyed count. Output: (node, tri) for nodes in ≥ 1
    * triangle — the numerator of the local clustering coefficient
    * (the denominator, deg·(deg−1)/2, is one cross-multiplication
    * away from the caller's degree frame, kept integer so coefficient
    * cuts stay exact).
    *
    * `degrees`: the caller's precomputed (node, deg) of EXACTLY this
    * edge set, when it already has one (the clustering-coefficient
    * query aggregates degrees for its own output columns — without
    * this hook the operator would recompute the identical aggregate,
    * one redundant exchange per serve). Contract: one row per node of
    * `edges` with its full degree — orientation joins INNER on it, so
    * a frame missing nodes silently drops their edges, and wrong
    * values change which corner anchors each wedge (the count stays
    * exact under any consistent total order, but the Σ outdeg² bound
    * is only the degree order's).
    */
  def perNode(edges: DataFrame, degrees: Option[DataFrame] = None)
      : DataFrame = {
    val co = edges.select("a", "b")
    val deg = degrees.getOrElse(
      co.select(col("a").as("node"))
        .unionAll(co.select(col("b").as("node")))
        .groupBy("node").agg(F.count(lit(1)).as("deg")))
      .select("node", "deg")
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = co
      .join(deg.toDF("a", "da"), "a")
      .join(deg.toDF("b", "db"), "b")
      .select(when(lowFirst, col("a")).otherwise(col("b")).as("u"),
        when(lowFirst, col("b")).otherwise(col("a")).as("v"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("u"), col("e1.v").as("a"), col("e2.v").as("b"))
    wedges.join(co, Seq("a", "b"), "left_semi")
      .select(F.explode(F.array(col("u"), col("a"), col("b"))).as("node"))
      .groupBy("node").agg(F.count(lit(1)).as("tri"))
  }
}
