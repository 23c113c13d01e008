package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source anti-filter — SURVEY.md §2.1 S4 / §2.2 P5.
  *
  * When syncing side A → side B, drop rows that ORIGINATED at B
  * (`source == B.sourceId`) so they are not echoed back — the
  * reference's `not term source=...` clause, gated on
  * `ignore_same_source` (pyCassElastic.py:386-399). Semantically a
  * semi-join reduction done as a pushed-down filter: rows that would
  * lose the LWW conflict anyway never cross the wire.
  *
  * Null semantics: rows with a NULL source tag are KEPT (unknown origin
  * must still sync) — hence the null-safe inequality, not `=!=` whose
  * null result would drop them.
  */
object AntiEcho {
  def apply(df: DataFrame, sourceCol: String, destSourceId: String): DataFrame =
    df.filter(!(col(sourceCol) <=> lit(destSourceId)))
}
