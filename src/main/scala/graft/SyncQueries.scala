package graft

import org.apache.spark.sql.functions._

import graft.core.{Tables, Watermark}
import graft.operators.{AntiEcho, IncrementalScan, LwwMerge, SnapshotDiff}

/** Reference-parity queries (SURVEY.md §2.1-§2.7) expressed over the
  * driver's `events` / `documents` tables, each with a DuckDB oracle.
  *
  * `events` plays the reference's sync table (FIXTURES.md): `event_id`
  * is the id, `ts` the event time, and `unix_millis(ts)` the monotone
  * `version` — exactly the reference's `unix_time_millis` versioning
  * (reference utils.py:68-74).
  */
object SyncQueries {

  // Fixed half-open window inside the events range (Jan 2024):
  // (2024-01-10 00:00, 2024-01-20 00:00] as epoch millis.
  private val winLast = 1704844800000L
  private val winThis = 1705708800000L

  val all: Seq[GraftQuery] = Seq(

    // S1/P1: projected scan — column pruning reaches the parquet reader.
    GraftQuery(
      "s1_projected_scan",
      """SELECT event_id, user_id, event_type
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.loadEvents(s, dir)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    },

    // S2/P4: incremental half-open window (last, this] on the derived
    // version column (reference pyCassElastic.py:205-212).
    GraftQuery(
      "s2_incremental_window",
      s"""SELECT event_id, user_id, epoch_ms(ts) AS version, event_type
         |FROM events
         |WHERE epoch_ms(ts) > $winLast AND epoch_ms(ts) <= $winThis
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
      IncrementalScan(ev, "version", Watermark.Span(winLast, winThis))
        .select("event_id", "user_id", "version", "event_type")
        .orderBy("event_id")
    },

    // S4/P5: source anti-echo filter (reference pyCassElastic.py:386-399).
    // documents has a real `source` column; NULL-source rows are kept.
    GraftQuery(
      "s4_anti_echo",
      """SELECT doc_id, source FROM documents
        |WHERE source IS DISTINCT FROM 'src7'
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      AntiEcho(Tables.load(s, dir, "documents"), "source", "src7")
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // S5: the DSv2 connector surface — the table is published into a
    // versioned snapshot store once (content-fingerprint keyed, like
    // every derived artifact), then read back through
    // format("graft-snapshot"): pointer-pinned scan, filters + pruning
    // delegated to the stock parquet path. The store is a faithful
    // copy, so the oracle runs on the original table.
    GraftQuery(
      "s5_snapshot_source",
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val io = graft.sources.ArtifactStore.io(s"$dir/customer.parquet", "snapshot")
      if (!io.exists)
        io.overwrite(s.read.parquet(s"$dir/customer.parquet"))
      s.read.format("graft-snapshot").load(io.path)
        .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 1000.0)
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy("c_custkey")
    },

    // Version-to-version CDC through the connector: two committed
    // snapshots read via option("version") time travel (exactly the
    // current + previous grace window the store's retention keeps),
    // diffed with SnapshotDiff — the change feed a downstream
    // incremental materialization consumes. Output ∝ churn.
    GraftQuery(
      "s6_version_diff",
      """WITH oldv AS (
        |  SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |  FROM customer WHERE c_custkey % 10 < 9),
        |newv AS (
        |  SELECT c_custkey, c_name,
        |    round(c_acctbal, 2)
        |      + CASE WHEN c_custkey % 10 = 5 THEN 100.0 ELSE 0.0 END AS acctbal
        |  FROM customer WHERE c_custkey % 10 <> 0)
        |SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
        |  CASE WHEN o.c_custkey IS NULL THEN 'insert'
        |       WHEN n.c_custkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  o.acctbal AS old_acctbal, n.acctbal AS new_acctbal
        |FROM oldv o FULL OUTER JOIN newv n ON o.c_custkey = n.c_custkey
        |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
        |   OR o.acctbal IS DISTINCT FROM n.acctbal
        |   OR o.c_name IS DISTINCT FROM n.c_name
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("acctbal"))
      val oldV = cust.filter(col("c_custkey") % 10 < 9)
      val newV = cust.filter(col("c_custkey") % 10 =!= 0)
        .withColumn("acctbal",
          col("acctbal") + when(col("c_custkey") % 10 === 5, 100.0).otherwise(0.0))
      val io = graft.sources.ArtifactStore.io(s"$dir/customer.parquet", "verdiff")
      if (!io.exists) { io.overwrite(oldV); io.overwrite(newV) }
      else if (io.currentVersion < 2) io.overwrite(newV) // crash between publishes
      val cur = io.currentVersion
      def at(v: Long) = s.read.format("graft-snapshot")
        .option("version", v).load(io.path)
      graft.operators.SnapshotDiff.diff(at(cur - 1), at(cur), Seq("c_custkey"))
        .select(col("c_custkey"), col("change_type"),
          col("old_acctbal"), col("new_acctbal"))
        .orderBy("c_custkey")
    },

    // Incremental view maintenance, end to end: the change feed
    // bootstraps on v1 and ticks over the v1→v2 diff, DeltaRollup
    // applying signed contributions — the maintained per-segment
    // aggregate MUST equal a direct aggregate of v2 (the oracle
    // computes exactly that; cents as exact integers so incremental
    // and direct summation orders can't drift). The maintenance
    // aggregation costs O(churn + groups); the poll-and-diff feed
    // itself scans both versions to derive the diff (no row-level
    // log in the store) — see DeltaRollup's cost note.
    GraftQuery(
      "s7_incremental_view",
      """WITH newv AS (
        |  SELECT c_custkey, c_mktsegment,
        |    round(round(c_acctbal, 2) * 100)::BIGINT
        |      + CASE WHEN c_custkey % 10 = 5 THEN 10000 ELSE 0 END AS cents
        |  FROM customer WHERE c_custkey % 10 <> 0)
        |SELECT c_mktsegment, count(*) AS n, sum(cents)::BIGINT AS sum_cents
        |FROM newv GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment"),
          round(round(col("c_acctbal"), 2) * 100, 0).cast("long").as("cents"))
      val oldV = cust.filter(col("c_custkey") % 10 < 9)
      val newV = cust.filter(col("c_custkey") % 10 =!= 0)
        .withColumn("cents",
          col("cents") + when(col("c_custkey") % 10 === 5, 10000L).otherwise(0L))
      val io = graft.sources.ArtifactStore.io(s"$dir/customer.parquet", "ivm")
      if (!io.exists) io.overwrite(oldV)
      // fresh cursor per run: bootstrap on the CURRENT version, then
      // publish v2 and tick over the diff
      val ckpt = java.nio.file.Files.createTempDirectory("ivm_cursor").toString
      val feed = new graft.sources.SnapshotChangeFeed(io.path, ckpt,
        Seq("c_custkey", "c_mktsegment"))
      var state: org.apache.spark.sql.DataFrame = null
      feed.bootstrap(s) { ch =>
        state = graft.operators.DeltaRollup.init(
          ch.withColumn("new_v", col("new_cents").cast("double"))
            .withColumn("old_v", col("old_cents").cast("double")),
          Seq("c_mktsegment"), "v")
      }
      if (io.currentVersion == feed.cursor.get) io.overwrite(newV)
      feed.tick(s) { ch =>
        state = graft.operators.DeltaRollup(state,
          ch.withColumn("new_v", col("new_cents").cast("double"))
            .withColumn("old_v", col("old_cents").cast("double")),
          Seq("c_mktsegment"), "v")
      }
      state.select(col("c_mktsegment"), col("n"),
          col("sum_v").cast("long").as("sum_cents"))
        .orderBy("c_mktsegment")
    },

    // A1 (window form): LWW latest state per key — the engine's reason
    // to exist (reference README.md:17, pyCassElastic.py:337-343).
    GraftQuery(
      "a1_lww_latest",
      """SELECT user_id, event_id, epoch_ms(ts) AS version, event_type,
        |       round(value, 2) AS value
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id
        |  ORDER BY epoch_ms(ts) DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
      LwwMerge.latestWindow(ev, Seq("user_id"), "version", Seq(col("event_id")))
        .select(col("user_id"), col("event_id"), col("version"),
          col("event_type"), round(col("value"), 2).as("value"))
        .orderBy("user_id")
    },

    // A1 (aggregate form): same semantics via max_by — the map-side-
    // combine formulation that scales (bytes shuffled ≈ distinct keys).
    GraftQuery(
      "a1_lww_latest_agg",
      """SELECT user_id, event_id, epoch_ms(ts) AS version, event_type
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id
        |  ORDER BY epoch_ms(ts) DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
        .select("user_id", "event_id", "version", "event_type")
      LwwMerge.latestAgg(ev, Seq("user_id"), "version", Seq(col("event_id")))
        .orderBy("user_id")
    },

    // A2: run-report counters (reference ok/error tallies,
    // pyCassElastic.py:93-95) as a grouped count.
    GraftQuery(
      "a2_counters",
      """SELECT event_type, count(*) AS n,
        |       count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        Tables.loadEvents(s, dir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
          .orderBy("event_type")
    },

    // SCD2 history: every version with its validity interval — the
    // warehouse complement of a1's current-state view (same version
    // total-order, one lead window). valid_to is -1 for the current
    // row (sentinel instead of NULL so both engines emit one integer
    // column type).
    GraftQuery(
      "a3_scd2_history",
      """SELECT user_id, event_id, epoch_ms(ts) AS valid_from,
        |  coalesce(lead(epoch_ms(ts)) OVER (
        |    PARTITION BY user_id ORDER BY epoch_ms(ts), event_id), -1)
        |    AS valid_to
        |FROM events
        |ORDER BY user_id, valid_from, event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
        .select("user_id", "event_id", "version")
      LwwMerge.history(ev, Seq("user_id"), "version", Seq(col("event_id")))
        .select(col("user_id"), col("event_id"),
          col("valid_from"), coalesce(col("valid_to"), lit(-1L)).as("valid_to"))
        .orderBy("user_id", "valid_from", "event_id")
    },

    // §2.7 set-op analogue: conflict winners vs losers split — rows of
    // the window that LOSE the LWW race (rank > 1) are the 409/delete
    // set (reference pyCassElastic.py:508-582).
    GraftQuery(
      "conflict_losers",
      """SELECT user_id, event_id, epoch_ms(ts) AS version
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id
        |  ORDER BY epoch_ms(ts) DESC, event_id DESC) > 1
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
        .select("user_id", "event_id", "version")
      graft.operators.ConflictSplit
        .losers(ev, Seq("user_id"), "version", Seq(col("event_id")))
        .orderBy("user_id", "event_id")
    },

    // THE composed sync tick — the exact end-to-end path the
    // reference's only recoverable baseline number measures (~11 s
    // for a 10,000-row bidirectional tick, BASELINE.md;
    // pyCassElastic.py:54-115): incremental half-open window scan
    // (S2) → anti-echo filter (S4) → LWW merge (A1: rank 1 per key =
    // the upsert set) → conflict-loser split (K3: rank > 1 = the
    // delete set). ConflictSplit.tagged produces BOTH sides from ONE
    // ranked pass — one scan of the pruned window slice, one key
    // shuffle — where the reference needs an ES round-trip per
    // conflicting batch to discover its losers.
    GraftQuery(
      "sync_tick",
      s"""WITH w AS (
         |  SELECT user_id, event_id, epoch_ms(ts) AS version FROM events
         |  WHERE epoch_ms(ts) > $winLast AND epoch_ms(ts) <= $winThis
         |    AND event_type IS DISTINCT FROM 'error'),
         |r AS (
         |  SELECT user_id, event_id, version,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY version DESC, event_id DESC) AS rnk
         |  FROM w)
         |SELECT user_id, event_id, version,
         |  CASE WHEN rnk = 1 THEN 'upsert' ELSE 'delete' END AS action
         |FROM r ORDER BY user_id, version, event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
      val windowed = IncrementalScan(ev, "version", Watermark.Span(winLast, winThis))
      val kept = AntiEcho(windowed, "event_type", "error")
        .select("user_id", "event_id", "version")
      graft.operators.ConflictSplit
        .tagged(kept, Seq("user_id"), "version", Seq(col("event_id")))
        .orderBy("user_id", "version", "event_id")
    },

    // CDC between two published LWW snapshots: the keyed delta a
    // downstream incremental consumer reads instead of re-shipping
    // whole windows (SnapshotDiff). Old = state as of Jan 15, new =
    // final state; change classes insert/update (no deletes in a
    // monotone LWW stream — the spec covers them synthetically).
    GraftQuery(
      "a4_snapshot_diff",
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS version FROM events
        |  WHERE epoch_ms(ts) <= 1705276800000
        |  QUALIFY row_number() OVER (
        |    PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) = 1),
        |n AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS version FROM events
        |  QUALIFY row_number() OVER (
        |    PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) = 1)
        |SELECT coalesce(o.user_id, n.user_id) AS user_id,
        |  CASE WHEN o.user_id IS NULL THEN 'insert'
        |       WHEN n.user_id IS NULL THEN 'delete'
        |       WHEN o.event_id IS DISTINCT FROM n.event_id
        |         OR o.version IS DISTINCT FROM n.version THEN 'update' END
        |    AS change_type,
        |  o.event_id AS old_event_id, o.version AS old_version,
        |  n.event_id AS new_event_id, n.version AS new_version
        |FROM o FULL JOIN n ON o.user_id = n.user_id
        |WHERE (o.user_id IS NULL OR n.user_id IS NULL
        |   OR o.event_id IS DISTINCT FROM n.event_id
        |   OR o.version IS DISTINCT FROM n.version)
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
        .select("user_id", "event_id", "version")
      val tie = Seq(col("event_id"))
      val oldSnap = LwwMerge.latestAgg(
        ev.filter(col("version") <= 1705276800000L), Seq("user_id"), "version", tie)
      val newSnap = LwwMerge.latestAgg(ev, Seq("user_id"), "version", tie)
      SnapshotDiff.diff(oldSnap, newSnap, Seq("user_id"),
          compareCols = Seq("event_id", "version"))
        .select(col("user_id"), col("change_type"),
          col("old_event_id"), col("old_version"),
          col("new_event_id"), col("new_version"))
        .orderBy("user_id")
    },

    // P7/F8: regex capture — the reference pulls the winning version out
    // of ES 409 messages with `provided \[(.*?)\]`
    // (pyCassElastic.py:519,548). Same expression over the events JSON
    // props column.
    GraftQuery(
      "p7_regex_extract",
      """SELECT event_id,
        |       CAST(coalesce(regexp_extract(props, '"k": (\d+)', 1), '') AS VARCHAR) AS k_str
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.loadEvents(s, dir)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k_str"))
        .orderBy("event_id")
    },

    // F11 companion: from_json with an EXPLICIT schema into a typed
    // struct feeding an aggregation — the scale-safe decode path (a
    // static schema keeps the parse codegen'd and one-pass; per-row
    // schema inference is the anti-pattern). Mirrors the reference
    // trusting a known _source shape (pyCassElastic.py:272-278).
    GraftQuery(
      "f12_json_struct_agg",
      """SELECT event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.loadEvents(s, dir)
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          round(avg(col("k")), 4).as("avg_k"))
        .orderBy("event_type")
    },

    // F11: JSON decode of the `_source`-style payload
    // (reference pyCassElastic.py:272-278 flattens the ES _source dict).
    GraftQuery(
      "f11_json_extract",
      """SELECT event_id,
        |       CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.loadEvents(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    },

    // F7: UUID-as-string canonicalization (reference stores UUIDs as
    // lowercase 36-char strings on the ES side, pyCassElastic.py:276,
    // 339,549). Deterministic "UUIDs" derived from md5 so the oracle
    // can replicate; validation via the canonical regex.
    GraftQuery(
      "f7_uuid_canonical",
      """SELECT event_id,
        |  concat(substring(h, 1, 8), '-', substring(h, 9, 4), '-',
        |         substring(h, 13, 4), '-', substring(h, 17, 4), '-',
        |         substring(h, 21, 12)) AS uuid_str,
        |  regexp_matches(concat(substring(h, 1, 8), '-', substring(h, 9, 4), '-',
        |         substring(h, 13, 4), '-', substring(h, 17, 4), '-',
        |         substring(h, 21, 12)),
        |    '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$') AS is_valid
        |FROM (SELECT event_id, md5(CAST(event_id AS VARCHAR)) AS h FROM events)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val h = md5(col("event_id").cast("string"))
      val uuid = concat(
        substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
        substring(h, 13, 4), lit("-"), substring(h, 17, 4), lit("-"),
        substring(h, 21, 12))
      Tables.loadEvents(s, dir)
        .select(col("event_id"), uuid.as("uuid_str"),
          regexp_like(uuid,
            lit("^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"))
            .as("is_valid"))
        .orderBy("event_id")
    },

    // F1-F5: the reference's time helpers (utils.py:58-74, watermark
    // codec pyCassElastic.py:154-170) as engine expressions.
    GraftQuery(
      "f_time_functions",
      """SELECT event_id,
        |       epoch_ms(ts)//1000 AS unix_sec,
        |       epoch_ms(ts) AS unix_ms,
        |       strftime(date_trunc('minute', ts), '%Y%m%d %H:%M') AS wm_str,
        |       strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%S') AS iso_sec
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.loadEvents(s, dir)
        .select(
          col("event_id"),
          expr("version div 1000").as("unix_sec"),
          col("version").as("unix_ms"),
          date_format(date_trunc("minute", col("ts")), "yyyyMMdd HH:mm").as("wm_str"),
          date_format(date_trunc("second", col("ts")), "yyyy-MM-dd'T'HH:mm:ss").as("iso_sec"))
        .orderBy("event_id")
    }
  )
}
