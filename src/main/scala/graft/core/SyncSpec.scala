package graft.core

/** One side of a sync: a table plus the origin tag written into its
  * rows. Mirrors the reference's per-store config blocks
  * (reference README.md:45-63, pyCassElastic.py:49-63).
  */
final case class SideSpec(
    table: String,
    sourceId: Option[String] = None)

/** Declarative unit of synchronization — the Spark-native equivalent of
  * one entry in the reference's `config['syncs']` list
  * (reference pyCassElastic.py:49-63):
  *
  *  - `idCol`       key column (reference: UUID `id`)
  *  - `versionCol`  monotone epoch-millis bigint; LWW criterion AND the
  *                  incremental-window filter column
  *  - `dateCol`     event-time timestamp (second-precision on the C* side)
  *  - `filterDate`  when true, scans select only the half-open window
  *                  (lastRun, thisRun] on `versionCol`
  *                  (reference pyCassElastic.py:205-212)
  *  - `ignoreSameSource` when true, a side's scan drops rows whose
  *                  `sourceCol` equals the *other* side's sourceId —
  *                  loop/echo prevention (reference pyCassElastic.py:386-399)
  */
final case class SyncSpec(
    name: String,
    left: SideSpec,
    right: SideSpec,
    idCol: String = "id",
    dateCol: String = "date",
    versionCol: String = "version",
    sourceCol: String = "source",
    filterDate: Boolean = false,
    ignoreSameSource: Boolean = false,
    // when the stores use ParquetTableIO.dayPartitioned, name its
    // partition column here so the incremental window also prunes
    // partitions (IncrementalScan dayCol) instead of only row groups
    dayCol: Option[String] = None)

/** Per-leg run report — the reference's ok/error tallies
  * (pyCassElastic.py:93-95, 348-349) as a value.
  */
final case class LegReport(name: String, rows: Long, conflicts: Long, elapsedMs: Long)
