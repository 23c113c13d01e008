package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IncrementalDocArtifact
import graft.sources.IncrementalDocArtifact.{MergePiece, Piece}

/** Stored, incrementally-maintained PageRank over a growing edge
  * table — the round-8 verdict's "last derived artifact rebuilt from
  * scratch": the rank vector persists through the artifact engine
  * (keyed by the edge files' ledger, so any non-append change keys a
  * full rebuild) and a pure edge-file APPEND advances it by
  * WARM-STARTING the iteration from the stored ranks instead of the
  * uniform vector ([[PageRank.converged]]): the previous fixpoint is
  * close to the new one when the graph grows incrementally, so the
  * same tolerance needs far fewer join+aggregate rounds
  * (spec-measured; the fixpoint is unique, so the destination is the
  * cold answer either way, to within `tol`).
  *
  * Pieces: `edges` (additive — the advance needs the WHOLE edge set
  * to iterate, and re-reading the stored piece beats re-listing the
  * corpus), `ranks` (keyed upsert — every node's rank row refreshes
  * per generation; that is the honest state size of a rank vector).
  *
  * The registered q43 stays the COLD fixed-iteration form (its
  * oracle unrolls 5 exact iterations bit-for-bit); this store is the
  * production serve path where tolerance, not iteration parity, is
  * the contract.
  */
object PageRankStore {

  // the EXACT parameters key the artifact — a rounded key would let
  // two different tolerances collide onto one stored vector and
  // serve a stricter caller an under-converged result
  private def key(tol: Double, d: Double): String = {
    def enc(x: Double) = x.toString.replace('.', 'p').replace('-', 'm')
    s"pagerank_d${enc(d)}_t${enc(tol)}"
  }

  private def handle(edgesPath: String, tol: Double, d: Double) =
    IncrementalDocArtifact(edgesPath, key(tol, d),
      pieces = Seq(
        Piece("edges", (docs, _) => docs.select(col("src"), col("dst")))),
      merges = Seq(
        MergePiece("ranks", Seq("node"),
          buildFull = (docs, ctx) =>
            PageRank.converged(ctx.spark,
              docs.select(col("src"), col("dst")), None, tol, d = d)._1,
          advance = ctx => {
            val all = ctx.stored("edges")
              .unionByName(ctx.newDocs.select(col("src"), col("dst")))
            PageRank.converged(ctx.spark, all,
              Some(ctx.stored("ranks")), tol, d = d)._1
          })),
      compactEvery = 8)

  /** Stored converged (node, pr) over the edge parquet table at
    * `edgesPath`; built on first use, warm-start-advanced when edge
    * files append.
    */
  def ranks(spark: SparkSession, edgesPath: String,
      tol: Double = 1e-9, d: Double = 0.85): DataFrame =
    handle(edgesPath, tol, d).serve(spark, "ranks")

  /** Offline compaction hook. */
  def compact(spark: SparkSession, edgesPath: String,
      tol: Double = 1e-9, d: Double = 0.85): Unit =
    handle(edgesPath, tol, d).compact(spark)
}
