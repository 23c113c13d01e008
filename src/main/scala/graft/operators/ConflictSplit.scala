package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Winners/losers partition of a batch under LWW — SURVEY.md §2.7.
  *
  * The reference discovers losers *reactively*: ES bulk returns 409 for
  * every row older than the incumbent, a regex pulls the winning
  * version out of the error message, and the loser rows are deleted
  * from Cassandra so they stop re-syncing (pyCassElastic.py:508-582,
  * error parse at :519,548). We compute the same partition
  * *declaratively* in one ranking pass: rank 1 per key = winner
  * (inserted), rank > 1 = loser (the delete set).
  *
  * Scale note: one shuffle on the key produces BOTH sides; the
  * reference needs a network round-trip per conflicting batch.
  */
object ConflictSplit {

  private def ranked(
      df: DataFrame,
      idCols: Seq[String],
      versionCol: String,
      tieBreak: Seq[Column]): DataFrame = {
    val w = Window
      .partitionBy(idCols.map(col): _*)
      .orderBy((col(versionCol).desc +: tieBreak.map(_.desc_nulls_last)): _*)
    df.withColumn("__rn", row_number().over(w))
  }

  def winners(df: DataFrame, idCols: Seq[String], versionCol: String,
      tieBreak: Seq[Column] = Nil): DataFrame =
    ranked(df, idCols, versionCol, tieBreak).filter(col("__rn") === 1).drop("__rn")

  def losers(df: DataFrame, idCols: Seq[String], versionCol: String,
      tieBreak: Seq[Column] = Nil): DataFrame =
    ranked(df, idCols, versionCol, tieBreak).filter(col("__rn") > 1).drop("__rn")

  /** Both partitions from a single ranked pass (cache the input if
    * consuming both, so the shuffle happens once).
    */
  def split(df: DataFrame, idCols: Seq[String], versionCol: String,
      tieBreak: Seq[Column] = Nil): (DataFrame, DataFrame) = {
    val r = ranked(df, idCols, versionCol, tieBreak)
    (r.filter(col("__rn") === 1).drop("__rn"),
     r.filter(col("__rn") > 1).drop("__rn"))
  }

  /** Winners AND losers as one tagged frame — ONE scan, ONE shuffle.
    * `split` as two separate frames plans two scans: the rank-1
    * branch earns a map-side WindowGroupLimit that makes its exchange
    * subtree non-identical to the losers branch, so exchange reuse
    * can't kick in and a union of the two sides reads the input
    * twice. When a sync tick consumes both sides together (upsert set
    * + delete set), this is the single-pass form.
    */
  def tagged(df: DataFrame, idCols: Seq[String], versionCol: String,
      tieBreak: Seq[Column] = Nil, actionCol: String = "action",
      winnerTag: String = "upsert", loserTag: String = "delete"): DataFrame =
    ranked(df, idCols, versionCol, tieBreak)
      .withColumn(actionCol,
        when(col("__rn") === 1, winnerTag).otherwise(loserTag))
      .drop("__rn")
}
