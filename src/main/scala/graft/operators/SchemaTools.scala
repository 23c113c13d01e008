package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Schema introspection, diff, and additive evolution — SURVEY.md §1.3.
  *
  * The reference discovers both stores' schemas at runtime
  * (`_get_table_schema` pyCassElastic.py:448-469, `_get_doc_schema`
  * :471-495), diffs them minus the id column (:433), and issues
  * `ALTER TABLE ADD {column} {type}` for every field the destination
  * lacks (:434-444) — evolution is ADD-COLUMN ONLY, one direction at a
  * time, with a type map (:497-506). The insert path then null-pads
  * fields the incoming row lacks (:270-274).
  *
  * On Spark, "introspection" is `df.schema`; diff is set difference on
  * `StructType.fields`; evolution is a projection (for an in-flight
  * DataFrame) or `ALTER TABLE ADD COLUMNS` (for a catalog table). The
  * null-pad projection is pure metadata — zero data movement, fully
  * codegen'd, and safe at any scale.
  */
object SchemaTools {

  /** Fields present in `source` but absent (by name) from `target` —
    * the reference's missing-column set (pyCassElastic.py:434-437).
    * Comparison ignores the excluded (id) columns, mirroring :433.
    */
  def missingIn(target: StructType, source: StructType,
      exclude: Seq[String] = Nil): Seq[org.apache.spark.sql.types.StructField] = {
    val have = target.fieldNames.toSet ++ exclude
    source.fields.filter(f => !have.contains(f.name)).toSeq
  }

  /** Same-named fields whose types DISAGREE between the two schemas —
    * the cross-store type-map gap the reference left as a TODO
    * (pyCassElastic.py:503 maps exactly one type and comments "need
    * to create the map between the types"): a silent pick-one here
    * corrupts data store-to-store, so the seam detects conflicts and
    * [[evolve]] fails loudly on them by default.
    */
  def typeConflicts(target: StructType, source: StructType,
      exclude: Seq[String] = Nil):
      Seq[(org.apache.spark.sql.types.StructField,
           org.apache.spark.sql.types.StructField)] = {
    val excl = exclude.toSet
    val byName = source.fields.map(f => f.name -> f).toMap
    target.fields.toSeq.filterNot(f => excl.contains(f.name))
      .flatMap(t => byName.get(t.name)
        .filter(_.dataType != t.dataType).map(s => (t, s)))
  }

  /** Fields `target` carries that `source` no longer has — a column
    * DROPPED upstream. Additive evolution intentionally keeps them
    * (the reference never issues DROP COLUMN), but a sync seam must
    * at least surface the divergence instead of null-padding forever
    * in silence.
    */
  def droppedFrom(target: StructType, source: StructType,
      exclude: Seq[String] = Nil): Seq[org.apache.spark.sql.types.StructField] =
    missingIn(source, target, exclude)

  /** Additive evolution: `target` plus every field `source` has that it
    * lacks (the reference's ALTER TABLE ADD loop, pyCassElastic.py:438-444).
    * Never drops or retypes existing fields; by default REFUSES a
    * source whose same-named fields carry different types (see
    * [[typeConflicts]]) — pass `failOnTypeConflict = false` to keep
    * the target's types knowingly (align() will then cast, which may
    * lose precision or null out unparseable values).
    */
  def evolve(target: StructType, source: StructType,
      failOnTypeConflict: Boolean = true): StructType = {
    if (failOnTypeConflict) {
      val conflicts = typeConflicts(target, source)
      require(conflicts.isEmpty,
        "schema evolution type conflicts (target vs source): " +
          conflicts.map { case (t, s) =>
            s"${t.name}: ${t.dataType.simpleString} vs ${s.dataType.simpleString}"
          }.mkString(", "))
    }
    StructType(target.fields.toSeq ++ missingIn(target, source))
  }

  /** Catalog-side additive evolution: the DDL form of [[evolve]] —
    * issues `ALTER TABLE … ADD COLUMNS` for every field `source` has
    * that the catalog table lacks, exactly the reference's
    * `sync_schemas` side effect (`ALTER TABLE ADD {column} {type}`
    * per missing field, pyCassElastic.py:438-444) against a real
    * catalog instead of a live Cassandra/ES pair. Same contract as
    * [[evolve]]: add-only, refuses same-named type conflicts by
    * default. Pre-existing rows read the new columns as NULL — the
    * reference's insert-side null-pad (:270-274) done by the catalog.
    * One metadata-only DDL statement regardless of table size.
    *
    * Returns the fields actually added (empty = already aligned).
    */
  def evolveTable(spark: SparkSession, table: String, source: StructType,
      failOnTypeConflict: Boolean = true): Seq[StructField] = {
    val current = spark.table(table).schema
    if (failOnTypeConflict) {
      val conflicts = typeConflicts(current, source)
      require(conflicts.isEmpty,
        s"catalog evolution type conflicts on $table: " +
          conflicts.map { case (t, s) =>
            s"${t.name}: ${t.dataType.simpleString} vs ${s.dataType.simpleString}"
          }.mkString(", "))
    }
    val missing = missingIn(current, source)
    if (missing.nonEmpty) {
      val cols = missing
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(s"ALTER TABLE $table ADD COLUMNS ($cols)")
    }
    missing
  }

  /** Project `df` onto `target`'s columns in `target`'s order,
    * null-padding absent ones — the reference's insert-side alignment
    * (pyCassElastic.py:240-241, 270-274). Columns `df` has beyond
    * `target` are dropped (the reference only binds the destination's
    * columns). Existing columns are cast to the target type so both
    * sides of a later union/merge agree.
    */
  def align(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(target.fields.toSeq.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Two-way union schema + both frames aligned to it: the state both
    * stores converge to after the reference's bidirectional
    * `sync_schemas` legs (pyCassElastic.py:412-446 run once per
    * direction).
    */
  def alignBoth(a: DataFrame, b: DataFrame): (DataFrame, DataFrame, StructType) = {
    val unified = evolve(a.schema, b.schema)
    (align(a, unified), align(b, unified), unified)
  }
}
