package graft.core

import org.apache.spark.sql.SparkSession

/** Config source — SURVEY.md §2.1 S6. The reference loads a JSON file
  * into nested dicts (`SyncCassElastic.py:24-38`) shaped like
  * README.md:45-63:
  *
  * {{{
  * { "period": 1,
  *   "syncs": [ { "name": "...", "id_col": "id", "date_col": "date",
  *                "version_col": "version", "filter_date": true,
  *                "ignore_same_source": true,
  *                "cassandra":      { "table": "...", "source_id": "CASSANDRA" },
  *                "elasticsearch":  { "index": "...", "source_id": "Elastic" } } ] }
  * }}}
  *
  * Zero-dependency parse: Spark's own JSON reader (multiLine) does the
  * decoding — the config becomes a one-row DataFrame whose nested
  * schema is inferred, then lifted into typed SyncSpecs. Unknown keys
  * are ignored (the reference is equally lax); missing optional keys
  * take SyncSpec defaults.
  */
object SyncConfig {

  final case class Config(periodSeconds: Long, syncs: Seq[SyncSpec])

  def load(spark: SparkSession, path: String): Config = {
    val df = spark.read.option("multiLine", true).json(path)
    // an empty file parses to zero rows and an undecodable one to a
    // lone _corrupt_record column — both previously fell through to a
    // silent empty Config. Fail with the reference CLI's message
    // (Python 2 json, asserted by tests/testMain.py:32) instead.
    if (df.isEmpty || df.columns.contains("_corrupt_record"))
      throw new IllegalArgumentException(s"No JSON object could be decoded: $path")
    val row = df.head()
    def opt[T](r: org.apache.spark.sql.Row, name: String): Option[T] =
      if (r.schema.fieldNames.contains(name) && !r.isNullAt(r.fieldIndex(name)))
        Some(r.getAs[T](name))
      else None

    val periodMin = opt[Long](row, "period").getOrElse(1L)
    val syncRows = opt[scala.collection.Seq[org.apache.spark.sql.Row]](row, "syncs")
      .getOrElse(Nil).toSeq
    val specs = syncRows.map { s =>
      def side(key: String, tableKey: String): SideSpec = {
        val r = opt[org.apache.spark.sql.Row](s, key)
        SideSpec(
          table = r.flatMap(opt[String](_, tableKey)).getOrElse(""),
          sourceId = r.flatMap(opt[String](_, "source_id")))
      }
      SyncSpec(
        name = opt[String](s, "name").getOrElse("sync"),
        left = side("cassandra", "table"),
        right = side("elasticsearch", "index"),
        idCol = opt[String](s, "id_col").getOrElse("id"),
        dateCol = opt[String](s, "date_col").getOrElse("date"),
        versionCol = opt[String](s, "version_col").getOrElse("version"),
        filterDate = opt[Boolean](s, "filter_date").getOrElse(false),
        ignoreSameSource = opt[Boolean](s, "ignore_same_source").getOrElse(false),
        // engine extension (no reference equivalent): name the stores'
        // day-partition column to turn window scans into pruning
        dayCol = opt[String](s, "day_col"))
    }
    // reference: period is minutes, x60 at SyncCassElastic.py:34-35
    Config(periodMin * 60, specs)
  }
}
