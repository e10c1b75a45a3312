package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core engine capabilities from SURVEY.md §2, each expressed as an
  * idiomatic DataFrame pipeline with a DuckDB oracle.
  *
  * The `events` table plays the change-log: `user_id` is the replicated
  * primary key, the event time (micros) is the record version (the raw
  * table's `_peerdb_timestamp`), and `event_type` maps onto the reference's
  * record types (signup→insert 0, error→delete 2, else update 1) — the same
  * 0/1/2 encoding as `_peerdb_record_type`
  * (/root/reference/flow/connectors/clickhouse/cdc.go:58-104).
  *
  * Output-type policy (drives the driver's cross-engine hash compare):
  *   - money/measure columns are exact integer cents (`*_c` BIGINT) computed
  *     through a DECIMAL(12,2) intermediate — no raw double aggregates;
  *   - nullable computed values are VARCHAR with '' for NULL, so null
  *     encoding never depends on engine/pandas dtype quirks;
  *   - every query ends in a total ORDER BY on non-null keys.
  *
  * Scale notes: every groupBy/window keys on high-cardinality columns
  * (user_id, pk, bucket), so the shuffles hash-partition evenly at 100 TB;
  * dimension joins are explicitly broadcast; filters/projections sit
  * directly on the parquet scan so pushdown + pruning apply.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Spread a small-file scan across the session's cores BEFORE the
    * per-row assembly/interpretation that follows — [[Tables.spread]]
    * (conditional: a no-op on already-wide scans, so at real scale
    * nothing is shuffled or coalesced). The exchange moves the RAW
    * columns (always narrower than the assembled images), and the Lua
    * stages' LuaParallelism then sees a wide batch and adds no second
    * shuffle. */
  private def spreadScan(df: DataFrame): DataFrame = Tables.spread(df)

  /** double → exact integer cents via a decimal(12,2) intermediate. */
  private def cents(c: Column): Column =
    (c.cast("decimal(12,2)") * 100).cast("bigint")
  private def centsSql(e: String): String =
    s"CAST(CAST($e AS DECIMAL(12,2)) * 100 AS BIGINT)"

  /** nullable decimal-cents → string with '' for NULL. */
  private def centsStr(c: Column): Column =
    coalesce(cents(c).cast("string"), lit(""))

  /** events with CDC framing columns. `ts` is canonical Long nanos
    * (storage-type normalized by Tables/EventsTs); version = micros. */
  private def changeLogFrame(events: DataFrame): DataFrame =
    events
      .withColumn("version", expr("ts div 1000"))
      .withColumn("rtype",
        when(col("event_type") === "signup", 0)
          .when(col("event_type") === "error", 2)
          .otherwise(1))

  private def changeLog(s: SparkSession, dir: String): DataFrame =
    changeLogFrame(t(s, dir, "events"))

  /** Typed sources + table map shared with the cached wire fixtures
    * ([[WireFixtures]] — the encode half of the decode round trips). */
  private[queries] def changeLogSrc(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Long, String, String, Long)] = {
    import s.implicits._
    changeLog(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      col("value").cast("decimal(12,2)").cast("string").as("value_s"),
      col("version"))
      .as[(Long, Long, String, String, Long)]
  }

  private[queries] def bsonSrc(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Long, String, Long, Long, Int)] = {
    import s.implicits._
    changeLog(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      cents(col("value")).as("value_c"), col("version"), col("rtype"))
      .as[(Long, Long, String, Long, Long, Int)]
  }

  private[queries] def binlogTableMap: graft.cdc.MysqlBinlog.TableMap = {
    import graft.cdc.MysqlBinlog._
    TableMap(7L, "app", "events",
      Array(ColType.LongLong, ColType.Varchar, ColType.NewDecimal),
      Array(0, 255, (12 << 8) | 2),
      Array(false, true, true),
      Seq("user_id", "event_type", "value"),
      Seq(true, true, true))
  }

  private val changeLogSql =
    """SELECT *, epoch_ns(ts) // 1000 AS version,
      |  CASE WHEN event_type='signup' THEN 0
      |       WHEN event_type='error' THEN 2 ELSE 1 END AS rtype
      |FROM events""".stripMargin

  /** latest row per key by (version, event_id) — the normalize dedup. */
  private def latestPerKey(df: DataFrame): DataFrame = df
    .withColumn("rn", row_number().over(
      Window.partitionBy("user_id")
        .orderBy(col("version").desc, col("event_id").desc)))
    .filter(col("rn") === 1)

  // ---------------------------------------------------------------- sources

  /** Projection/exclusion/rename/cast at the scan — TableMapping.exclude +
    * per-column overrides (cdc.go:335-386, normalize_query.go:146-160).
    * Catalyst prunes the parquet scan to exactly these columns. */
  val projectionExclude = GraftQuery(
    "q_projection_exclude",
    "column exclusion + rename + type override at pull",
    (s, dir) => t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        cents(col("l_quantity")).as("qty_c"),
        col("l_returnflag").as("flag"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some(s"""SELECT l_orderkey, l_linenumber,
            |  ${centsSql("l_quantity")} AS qty_c,
            |  l_returnflag AS flag
            |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** QRep watermark pull: rows strictly after the stored offset
    * (qrep_source.go:157-236). The filter targets the RAW `ts` column with
    * the integer-equivalent bound (`version > V ⇔ ts ≥ (V+1)·1000` for the
    * nanos carrier) — a predicate on the derived `version` would not reach
    * the parquet scan; this one pushes down (asserted in PlanSpec). */
  val filterWatermark = GraftQuery(
    "q_filter_watermark",
    "watermark-column incremental pull (> lastRangeEnd)",
    // Filter on the RAW scan so the watermark predicate pushes into
    // parquet (row-group skip at scale), then normalize ts and frame.
    (s, dir) => changeLogFrame(EventsTs.toNanos(
        EventsTs.atLeastNanos(Tables.raw(s, dir, "events"),
          1705708800000001000L))) // > 2024-01-20 UTC
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("version"))
      .orderBy("event_id"),
    Some(s"""SELECT event_id, user_id, event_type, version
            |FROM ($changeLogSql)
            |WHERE version > 1705708800000000
            |ORDER BY event_id""".stripMargin))

  /** NTILE equal-row-count range partitioning (qrep_partition.go:38-79):
    * bucket → [min,max] watermark range + row count. Distributed global
    * ranking (GlobalRank: range exchange + zipWithIndex) instead of
    * `ntile().over(Window.orderBy(...))`, which would move every row to a
    * single partition. */
  val partitionNtile = GraftQuery(
    "q_partition_ntile",
    "NTILE(8) equal-count partition ranges over the watermark column",
    (s, dir) => graft.operators.GlobalRank.withNtile(
        t(s, dir, "orders").select(col("o_orderkey")),
        Seq(col("o_orderkey")), buckets = 8)
      .groupBy("bucket")
      .agg(min("o_orderkey").as("range_start"),
        max("o_orderkey").as("range_end"),
        count(lit(1)).as("cnt"))
      .orderBy("bucket"),
    Some("""SELECT bucket, min(o_orderkey) AS range_start,
           |  max(o_orderkey) AS range_end, count(*) AS cnt
           |FROM (SELECT o_orderkey,
           |        NTILE(8) OVER (ORDER BY o_orderkey) AS bucket
           |      FROM orders)
           |GROUP BY bucket ORDER BY bucket""".stripMargin))

  /** Min/max uniform range partitioning (qrep_partition.go:85-117,
    * utils/partition.go:339-358): arithmetic split of [min,max]. The 1-row
    * bounds frame is broadcast; integer arithmetic only. */
  val partitionMinMax = GraftQuery(
    "q_partition_minmax",
    "min/max uniform range partitioning (ComputeRanges)",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"))
      val bounds = o.agg(min("o_orderkey").as("mn"), max("o_orderkey").as("mx"))
      o.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          expr("CAST((o_orderkey - mn) * 8 DIV (mx - mn + 1) AS INT)"))
        .groupBy("bucket")
        .agg(min("o_orderkey").as("range_start"),
          max("o_orderkey").as("range_end"),
          count(lit(1)).as("cnt"))
        .orderBy("bucket")
    },
    Some("""WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx
           |           FROM orders)
           |SELECT CAST(((o_orderkey - mn) * 8) // (mx - mn + 1) AS INT)
           |    AS bucket,
           |  min(o_orderkey) AS range_start, max(o_orderkey) AS range_end,
           |  count(*) AS cnt
           |FROM orders, b
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Fixed rows-per-partition chunking (num_rows_per_partition,
    * nexus/analyzer/src/qrep.rs:75-80): ceil(row_number/N) chunk ids,
    * ranked via the distributed GlobalRank (no single-partition window). */
  val partitionRowChunk = GraftQuery(
    "q_partition_rowchunk",
    "rows-per-partition chunking of an ordered snapshot read",
    (s, dir) => graft.operators.GlobalRank.withRowNumber(
        t(s, dir, "orders").select(col("o_orderkey")),
        Seq(col("o_orderkey")), rnCol = "rn")
      .withColumn("chunk", expr("CAST((rn - 1) DIV 2000 AS INT)"))
      .groupBy("chunk")
      .agg(min("o_orderkey").as("range_start"),
        max("o_orderkey").as("range_end"),
        count(lit(1)).as("cnt"))
      .orderBy("chunk"),
    Some("""SELECT chunk, min(o_orderkey) AS range_start,
           |  max(o_orderkey) AS range_end, count(*) AS cnt
           |FROM (SELECT o_orderkey,
           |        CAST((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // 2000
           |          AS INT) AS chunk
           |      FROM orders)
           |GROUP BY chunk ORDER BY chunk""".stripMargin))

  /** CTID physical-block partitioning (qrep_partition.go:122-290): fixed
    * heap-page ranges instead of value or rank splits. The page id is a
    * pure scan-side expression (key DIV rows-per-page as the stand-in for
    * the tuple's physical block) — no global pass at all, unlike NTILE;
    * the emitted (block, range, cnt) rows are exactly the TID-range
    * predicates the snapshot readers fan out on. */
  val partitionCtid = GraftQuery(
    "q_partition_ctid",
    "CTID-style physical block-range partitioning",
    (s, dir) => t(s, dir, "orders").select(col("o_orderkey"))
      .withColumn("block", expr("CAST(o_orderkey DIV 4096 AS INT)"))
      .groupBy("block")
      .agg(min("o_orderkey").as("range_start"),
        max("o_orderkey").as("range_end"),
        count(lit(1)).as("cnt"))
      .orderBy("block"),
    Some("""SELECT CAST(o_orderkey // 4096 AS INT) AS block,
           |  min(o_orderkey) AS range_start, max(o_orderkey) AS range_end,
           |  count(*) AS cnt
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** XMIN incremental scan (qrep_source.go:541-627, xmin_flow.go): pull
    * rows whose 32-bit transaction id is AFTER the stored cursor in
    * MODULAR order — the wraparound-safe comparison (`age(xmin)`
    * semantics): newer ⇔ 0 < (xmin − cursor) mod 2³² ≤ 2³¹. The cursor
    * sits just below the wrap point so the window spans it. */
  val xminScan = GraftQuery(
    "q_xmin_scan",
    "XMIN wraparound-safe incremental scan (age(xmin) cursor)",
    (s, dir) => {
      val cursor = 4294900000L // near 2^32: the modular window wraps
      changeLog(s, dir)
        .withColumn("xmin", expr("version % 4294967296"))
        .withColumn("age", expr(s"pmod(xmin - $cursor, 4294967296)"))
        .filter(col("age") > 0 && col("age") <= 2147483648L)
        .select(col("event_id"), col("xmin"))
        .orderBy("event_id")
    },
    Some(s"""SELECT event_id, xmin FROM (
            |  SELECT event_id, version % 4294967296 AS xmin,
            |    ((version % 4294967296) - 4294900000 + 4294967296)
            |      % 4294967296 AS age
            |  FROM ($changeLogSql))
            |WHERE age > 0 AND age <= 2147483648
            |ORDER BY event_id""".stripMargin))

  // ------------------------------------------------------------- normalize

  /** THE core analytic op of the engine: latest record per key by version —
    * BigQuery RANK dedup (merge_stmt_generator.go:115-128), ClickHouse
    * ReplacingMergeTree(version) semantics. Hash-shuffles on the PK: even at
    * 100 TB the window partitions by high-cardinality key. */
  val dedupLatest = GraftQuery(
    "q_dedup_latest",
    "latest-version-per-primary-key dedup window",
    (s, dir) => latestPerKey(changeLog(s, dir))
      .select(col("user_id"), col("event_id"), col("event_type"),
        cents(col("value")).as("value_c"))
      .orderBy("user_id"),
    Some(s"""SELECT user_id, event_id, event_type,
            |  ${centsSql("value")} AS value_c
            |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
            |        ORDER BY version DESC, event_id DESC) AS rn
            |      FROM ($changeLogSql))
            |WHERE rn = 1 ORDER BY user_id""".stripMargin))

  /** Normalize with soft delete: latest row per key keeps
    * `_peerdb_is_deleted` + `_peerdb_version` (normalize_query.go:327-332). */
  val normalizeSoftDelete = GraftQuery(
    "q_normalize_softdelete",
    "normalize raw→final with soft-delete + version columns",
    (s, dir) => latestPerKey(changeLog(s, dir))
      .select(col("user_id"),
        cents(col("value")).as("value_c"),
        (col("rtype") === 2).as("_peerdb_is_deleted"),
        col("version").as("_peerdb_version"))
      .orderBy("user_id"),
    Some(s"""SELECT user_id, ${centsSql("value")} AS value_c,
            |  (rtype = 2) AS _peerdb_is_deleted,
            |  version AS _peerdb_version
            |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
            |        ORDER BY version DESC, event_id DESC) AS rn
            |      FROM ($changeLogSql))
            |WHERE rn = 1 ORDER BY user_id""".stripMargin))

  /** Hard-delete view of the same normalize (deleted keys filtered out) —
    * what a `SELECT` on the destination table sees. */
  val normalizeFinal = GraftQuery(
    "q_cdc_normalize",
    "full CDC normalize: final table state after replaying the change log",
    (s, dir) => latestPerKey(changeLog(s, dir))
      .filter(col("rtype") =!= 2)
      .select(col("user_id"), col("event_id"), col("event_type"),
        cents(col("value")).as("value_c"),
        col("version").as("_peerdb_version"))
      .orderBy("user_id"),
    Some(s"""SELECT user_id, event_id, event_type,
            |  ${centsSql("value")} AS value_c,
            |  version AS _peerdb_version
            |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
            |        ORDER BY version DESC, event_id DESC) AS rn
            |      FROM ($changeLogSql))
            |WHERE rn = 1 AND rtype <> 2 ORDER BY user_id""".stripMargin))

  /** TOAST backfill: a column absent from an update (here: click events
    * carry no value) takes the last present value for the key, in commit
    * order — within-batch backfill via `last(ignoreNulls)` over the
    * tx-ordered window (record_items.go:60-70, cdc.go:1139-1215). */
  val toastBackfill = GraftQuery(
    "q_toast_backfill",
    "unchanged-TOAST column backfill (last non-absent value per key)",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("version"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      changeLog(s, dir)
        .withColumn("v",
          when(col("event_type") === "click", lit(null))
            .otherwise(cents(col("value"))))
        .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("event_id"),
          coalesce(col("v").cast("string"), lit("")).as("v_s"),
          coalesce(col("filled").cast("string"), lit("")).as("filled_s"))
        .orderBy("user_id", "event_id")
    },
    Some(s"""SELECT user_id, event_id,
            |  coalesce(CAST(v AS VARCHAR), '') AS v_s,
            |  coalesce(CAST(last_value(v IGNORE NULLS) OVER (
            |    PARTITION BY user_id ORDER BY version, event_id
            |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            |    AS VARCHAR), '') AS filled_s
            |FROM (SELECT *, CASE WHEN event_type='click' THEN NULL
            |        ELSE ${centsSql("value")} END AS v
            |      FROM ($changeLogSql))
            |ORDER BY user_id, event_id""".stripMargin))

  /** PK-changing update: normalize synthesizes a delete of the OLD key at
    * version−1 and unions it in (normalize_query.go:339-357). */
  val pkUpdateUnion = GraftQuery(
    "q_pk_update_union",
    "primary-key-update path: synthesized old-key delete at version-1",
    (s, dir) => {
      val cl = changeLog(s, dir)
      val base = cl.select(col("user_id").as("pk"), col("version"),
        col("rtype"), lit("main").as("src"))
      val oldKeyDeletes = cl.filter(col("event_type") === "purchase")
        .select((col("user_id") + 1000000L).as("pk"),
          (col("version") - 1).as("version"),
          lit(2).as("rtype"), lit("pkchange").as("src"))
      base.unionByName(oldKeyDeletes)
        .orderBy("pk", "version", "rtype", "src")
    },
    Some(s"""WITH cl AS ($changeLogSql)
            |SELECT user_id AS pk, version, rtype, 'main' AS src FROM cl
            |UNION ALL
            |SELECT user_id + 1000000 AS pk, version - 1 AS version,
            |  2 AS rtype, 'pkchange' AS src
            |FROM cl WHERE event_type = 'purchase'
            |ORDER BY pk, version, rtype, src""".stripMargin))

  /** The raw staging table itself (SURVEY §2.4): uid, micros version,
    * destination table, JSON payload, record type, batch id. JSON is built
    * with explicit concat so the bytes are engine-independent. */
  val rawChangefeed = GraftQuery(
    "q_raw_changefeed",
    "raw change-feed rows: _peerdb_* staging schema incl. JSON payload",
    (s, dir) => changeLog(s, dir)
      .select(
        md5(col("event_id").cast("string")).as("_peerdb_uid"),
        col("version").as("_peerdb_timestamp"),
        lit("public.events").as("_peerdb_destination_table_name"),
        concat(lit("{\"user_id\":"), col("user_id").cast("string"),
          lit(",\"event_type\":\""), col("event_type"),
          lit("\",\"value\":"),
          col("value").cast("decimal(12,2)").cast("string"),
          lit("}")).as("_peerdb_data"),
        col("rtype").as("_peerdb_record_type"),
        expr("event_id DIV 1000").as("_peerdb_batch_id"))
      .orderBy("_peerdb_timestamp", "_peerdb_uid"),
    Some(s"""SELECT md5(CAST(event_id AS VARCHAR)) AS _peerdb_uid,
            |  version AS _peerdb_timestamp,
            |  'public.events' AS _peerdb_destination_table_name,
            |  '{"user_id":' || user_id || ',"event_type":"' || event_type ||
            |    '","value":' || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR)
            |    || '}' AS _peerdb_data,
            |  rtype AS _peerdb_record_type,
            |  event_id // 1000 AS _peerdb_batch_id
            |FROM ($changeLogSql)
            |ORDER BY _peerdb_timestamp, _peerdb_uid""".stripMargin))

  /** pgoutput BINARY wire decode — the reference's actual CDC core
    * (processMessage dispatch + processTuple + decodeColumnData,
    * cdc.go:999-1443) exercised end-to-end and DISTRIBUTED: each
    * partition of `events` is re-framed as a pgoutput byte stream
    * (Relation, then per event Begin → Insert/Update/Delete → Commit,
    * via [[graft.cdc.PgOutput.encode]]) and decoded back by a
    * per-partition [[graft.cdc.PgOutputDecoder]] — no shuffle until the
    * final ORDER BY; the oracle reproduces the decoded relation
    * relationally. Exercises: tuple text decode, key images ('K'),
    * replident-full old images ('O'), unchanged-TOAST ('u') absence,
    * PG-epoch commit timestamps, xid/commit bookkeeping. */
  val pgoutputDecode = GraftQuery(
    "q_pgoutput_decode",
    "pgoutput binary wire decode: per-partition encode→decode round trip",
    (s, dir) => {
      import s.implicits._
      // Wire bytes come from the pinned fixture ([[WireFixtures]]): in
      // production they arrive from the capture/replication transport,
      // so the measured work here is the DECODE half + assembly.
      val decoded = WireFixtures.pgoutFrames(s, dir)
        .as[(Long, Seq[Array[Byte]])]
        .mapPartitions { it =>
          import graft.cdc.PgOutput._
          val relId = 50000
          val rel = Relation(relId, "public", "events", 'd'.toInt, Seq(
            RelationColumn(1, "user_id", Oid.Int8, -1),
            RelationColumn(0, "event_type", Oid.Text, -1),
            RelationColumn(0, "value", Oid.Numeric, -1)))
          val dec = new graft.cdc.PgOutputDecoder(_ => true, _ => "events")
          val stream: Iterator[(Long, Array[Byte])] =
            Iterator(0L -> encode(rel)) ++
              it.flatMap { case (eid, fs) => fs.iterator.map(eid -> _) }
          stream.flatMap { case (lsn, bytes) => dec.feed(lsn, bytes) }
            .map(r => (r.checkpointId, r.recordType, r.sourceTable,
              r.destinationTable, r.transactionId, r.commitTimeMicros,
              Option(r.data).getOrElse(""),
              Option(r.matchData).getOrElse(""),
              r.unchangedToastColumns.mkString(",")))
        }
      decoded.toDF("checkpoint_id", "record_type", "source_table",
        "dest_table", "tx_id", "commit_micros", "data_json", "match_json",
        "utc").orderBy("checkpoint_id")
    },
    Some(s"""SELECT event_id AS checkpoint_id, rtype AS record_type,
            |  'public.events' AS source_table, 'events' AS dest_table,
            |  event_id AS tx_id, version AS commit_micros,
            |  CASE WHEN event_type = 'error' THEN ''
            |    WHEN event_type = 'click' THEN '{"user_id":' || user_id
            |      || ',"event_type":"click"}'
            |    ELSE '{"user_id":' || user_id || ',"event_type":"'
            |      || event_type || '","value":'
            |      || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) || '}'
            |    END AS data_json,
            |  CASE WHEN event_type = 'signup' THEN ''
            |    WHEN event_type IN ('error','click')
            |      THEN '{"user_id":' || user_id || '}'
            |    ELSE '{"user_id":' || user_id || ',"event_type":"'
            |      || event_type || '","value":'
            |      || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) || '}'
            |    END AS match_json,
            |  CASE WHEN event_type = 'click' THEN 'value' ELSE '' END AS utc
            |FROM ($changeLogSql)
            |ORDER BY checkpoint_id""".stripMargin))

  /** MySQL binlog (ROW format) wire decode, distributed: each partition
    * re-frames its events rows as binary binlog events — FormatDescription
    * + TABLE_MAP (column names/signedness in optional metadata) + per-tx
    * BEGIN / ROWS / XID — via [[graft.cdc.MysqlBinlog]]'s inverse codec,
    * then decodes them back through a per-partition
    * [[graft.cdc.MysqlBinlogDecoder]]. Exercises: little-endian framing,
    * lenenc metadata, packed-decimal decode, MINIMAL row images (absent →
    * unchanged-toast), key-only old/delete images, header-seconds commit
    * times. No shuffle until the final ORDER BY; the oracle reproduces
    * the decoded relation relationally. */
  val binlogDecode = GraftQuery(
    "q_binlog_decode",
    "MySQL binlog binary wire decode: per-partition encode→decode round trip",
    (s, dir) => {
      import s.implicits._
      // Wire bytes come from the pinned fixture ([[WireFixtures]]) —
      // the measured work is the DECODE half + assembly.
      val tm = binlogTableMap
      val decoded = WireFixtures.binlogEvents(s, dir)
        .as[(Long, Seq[Array[Byte]])]
        .mapPartitions { it =>
          import graft.cdc.MysqlBinlog._
          val dec =
            new graft.cdc.MysqlBinlogDecoder(_ => true, _ => "events")
          val stream: Iterator[Array[Byte]] =
            Iterator(encodeFormatDescription(0L, 0L),
              encodeTableMap(0L, 0L, tm)) ++
              it.flatMap(_._2.iterator)
          stream.flatMap(dec.feed).map(r => (r.checkpointId,
            r.recordType, r.sourceTable, r.destinationTable,
            r.commitTimeMicros, Option(r.data).getOrElse(""),
            Option(r.matchData).getOrElse(""),
            r.unchangedToastColumns.mkString(",")))
        }
      decoded.toDF("checkpoint_id", "record_type", "source_table",
        "dest_table", "commit_micros", "data_json", "match_json", "utc")
        .orderBy("checkpoint_id")
    },
    Some(s"""SELECT event_id AS checkpoint_id, rtype AS record_type,
            |  'app.events' AS source_table, 'events' AS dest_table,
            |  (version // 1000000) * 1000000 AS commit_micros,
            |  CASE WHEN event_type = 'error' THEN ''
            |    WHEN event_type = 'click' THEN '{"user_id":' || user_id
            |      || ',"event_type":"click"}'
            |    ELSE '{"user_id":' || user_id || ',"event_type":"'
            |      || event_type || '","value":'
            |      || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) || '}'
            |    END AS data_json,
            |  CASE WHEN event_type = 'signup' THEN ''
            |    WHEN event_type IN ('error','click')
            |      THEN '{"user_id":' || user_id || '}'
            |    ELSE '{"user_id":' || user_id || ',"event_type":"'
            |      || event_type || '","value":'
            |      || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) || '}'
            |    END AS match_json,
            |  CASE WHEN event_type = 'click' THEN 'value' ELSE '' END AS utc
            |FROM ($changeLogSql)
            |ORDER BY checkpoint_id""".stripMargin))

  /** Mongo BSON decode breadth (mongo/qvalue_convert.go `rawDocToJSON` /
    * `QValueStringFromId`): each partition re-frames its events rows as
    * binary BSON documents ([[graft.cdc.Bson]] encoder), then decodes
    * them back through the engine's direct BSON→JSON converter —
    * ObjectId hex `_id`s, int64s, strings, RFC3339 datetimes with
    * trimmed fractions, arrays, bools, nulls. Distributed, shuffle-free
    * until the final ORDER BY; the oracle builds the expected JSON
    * relationally. */
  val bsonNormalize = GraftQuery(
    "q_bson_normalize",
    "BSON binary decode: per-partition encode→JSON-normalize round trip",
    (s, dir) => {
      import s.implicits._
      // BSON documents come from the pinned fixture ([[WireFixtures]]);
      // the `_id` string is pulled from the WIRE bytes via the element
      // walk — the decode path owns id extraction, as in the reference.
      val decoded = WireFixtures.bsonDocs(s, dir)
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          import graft.cdc.Bson._
          it.map { case (eid, doc) =>
            val (_, tpe, value) = elements(doc)
              .find(_._1 == "_id").get
            (eid, idToString(tpe, value), documentToJson(doc))
          }
        }
      decoded.toDF("doc_id", "id_str", "bson_json").orderBy("doc_id")
    },
    Some(s"""SELECT event_id AS doc_id,
            |  lpad(lower(to_hex(event_id)), 24, '0') AS id_str,
            |  '{"_id":"' || lpad(lower(to_hex(event_id)), 24, '0')
            |    || '","user_id":' || user_id
            |    || ',"event_type":"' || event_type
            |    || '","value_c":' || ${centsSql("value")}
            |    || ',"ts":"'
            |    || strftime(make_timestamp((version // 1000000) * 1000000),
            |         '%Y-%m-%dT%H:%M:%S')
            |    || CASE WHEN (version // 1000) % 1000 = 0 THEN ''
            |         ELSE '.' || rtrim(lpad(
            |           CAST((version // 1000) % 1000 AS VARCHAR), 3, '0'),
            |           '0') END
            |    || 'Z","tags":["' || event_type || '",' || user_id
            |    || '],"deleted":' || CAST(rtype = 2 AS VARCHAR)
            |    || ',"nul":null}' AS bson_json
            |FROM ($changeLogSql)
            |ORDER BY doc_id""".stripMargin))

  /** GTID-set checkpoint algebra (the MySQL text-offset rule,
    * flow/model/cdc_stream.go:33-36): per user, two shard checkpoints
    * built from event-id aggregates parse, MERGE (union with
    * overlap/adjacency coalescing) and render canonically through
    * [[graft.cdc.TextCheckpoint.GtidSet]]; `user_id % 3` steers each
    * group into the overlap / adjacent / disjoint branch, all of which
    * the oracle reproduces arithmetically. */
  val gtidMerge = GraftQuery(
    "q_gtid_merge",
    "GTID-set parse + shard-checkpoint merge + canonical render",
    (s, dir) => {
      import org.apache.spark.sql.functions.udf
      val mergeUdf = udf((a: String, b: String) =>
        graft.cdc.TextCheckpoint.GtidSet.parse(a)
          .merge(graft.cdc.TextCheckpoint.GtidSet.parse(b)).render)
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(min("event_id").as("a1"), max("event_id").as("b2"),
          count(lit(1)).as("cnt"))
        // interval arithmetic needs room; GTID tx-ids are non-negative by
        // spec, so negative source ids are excluded on BOTH sides
        .filter(col("cnt") >= 6 && col("a1") >= 0)
        .withColumn("b1", col("a1") + expr("cnt DIV 2"))
        .withColumn("a2c", least(
          col("a1") + expr("cnt DIV 2") + col("user_id") % 3, col("b2")))
        .withColumn("g1", concat(lit("u1:"), col("a1"), lit("-"),
          col("b1")))
        .withColumn("g2", concat(lit("u1:"), col("a2c"), lit("-"),
          col("b2"), lit(",u2:"), col("cnt")))
        .select(col("user_id"),
          mergeUdf(col("g1"), col("g2")).as("gtid_merged"))
        .orderBy("user_id")
    },
    Some("""WITH g AS (
           |  SELECT user_id, min(event_id) AS a1, max(event_id) AS b2,
           |    count(*) AS cnt
           |  FROM events GROUP BY user_id
           |  HAVING count(*) >= 6 AND min(event_id) >= 0),
           |p AS (
           |  SELECT user_id, a1, b2, cnt, a1 + cnt // 2 AS b1,
           |    least(a1 + cnt // 2 + user_id % 3, b2) AS a2c
           |  FROM g)
           |SELECT user_id,
           |  CASE WHEN a2c <= b1 + 1
           |    THEN 'u1:' || a1 || '-' || greatest(b1, b2)
           |    ELSE 'u1:' || a1 || '-' || b1 || ':' ||
           |      CASE WHEN a2c = b2 THEN CAST(a2c AS VARCHAR)
           |           ELSE a2c || '-' || b2 END
           |    END || ',u2:' || cnt AS gtid_merged
           |FROM p ORDER BY user_id""".stripMargin))

  /** Idempotent MERGE/upsert of an incoming batch into existing state
    * (normalize_stmt_generator.go:148-278): matched+delete → tombstone,
    * matched → update, not-matched → insert. */
  val mergeUpsert = GraftQuery(
    "q_merge_upsert",
    "MERGE semantics: upsert incoming batch over existing keys + deletes",
    (s, dir) => {
      val cl = changeLog(s, dir)
      val cutoff = 1706140800000000L // 2024-01-25 UTC
      val existing = latestPerKey(cl.filter(col("version") <= cutoff))
        .select(col("user_id"), cents(col("value")).as("ex_v"))
      val incoming = latestPerKey(cl.filter(col("version") > cutoff))
        .select(col("user_id"), cents(col("value")).as("in_v"),
          col("rtype").as("in_rtype"))
      existing.join(incoming, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(
            when(col("in_rtype") === 2, lit(null))
              .otherwise(coalesce(col("in_v"), col("ex_v")))
              .cast("string"),
            lit("")).as("value_s"),
          coalesce(col("in_rtype") === 2, lit(false)).as("deleted"))
        .orderBy("user_id")
    },
    Some(s"""WITH cl AS ($changeLogSql),
            |ex AS (SELECT user_id, ${centsSql("value")} AS ex_v
            |       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
            |               ORDER BY version DESC, event_id DESC) AS rn
            |             FROM cl WHERE version <= 1706140800000000)
            |       WHERE rn = 1),
            |inc AS (SELECT user_id, ${centsSql("value")} AS in_v,
            |          rtype AS in_rtype
            |        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
            |                ORDER BY version DESC, event_id DESC) AS rn
            |              FROM cl WHERE version > 1706140800000000)
            |        WHERE rn = 1)
            |SELECT coalesce(ex.user_id, inc.user_id) AS user_id,
            |  coalesce(CAST(CASE WHEN inc.in_rtype = 2 THEN NULL
            |    ELSE coalesce(inc.in_v, ex.ex_v) END AS VARCHAR), '')
            |    AS value_s,
            |  coalesce(inc.in_rtype = 2, false) AS deleted
            |FROM ex FULL JOIN inc ON ex.user_id = inc.user_id
            |ORDER BY user_id""".stripMargin))

  /** Schema evolution: rows from before an ADD COLUMN delta carry NULL for
    * the new column; unionByName(allowMissingColumns) widens the stream
    * (applySchemaDeltas, flowable_core.go:65-119). */
  val schemaEvolution = GraftQuery(
    "q_schema_evolution",
    "add-column schema delta: old-schema rows widen with NULLs",
    (s, dir) => {
      val cl = changeLog(s, dir)
      val cutoff = 1705276800000000L // 2024-01-15 UTC
      val v1 = cl.filter(col("version") <= cutoff)
        .select(col("event_id"), col("user_id")) // schema version 1: no value
      val v2 = cl.filter(col("version") > cutoff)
        .select(col("event_id"), col("user_id"),
          cents(col("value")).as("value_c"))
      v1.unionByName(v2, allowMissingColumns = true)
        .withColumn("schema_ver",
          when(col("value_c").isNull, 1).otherwise(2))
        .groupBy("schema_ver")
        .agg(count(lit(1)).as("cnt"),
          sum(coalesce(col("value_c"), lit(0L))).as("total_c"))
        .orderBy("schema_ver")
    },
    Some(s"""WITH cl AS ($changeLogSql),
            |widened AS (
            |  SELECT event_id, user_id, CAST(NULL AS BIGINT) AS value_c
            |  FROM cl WHERE version <= 1705276800000000
            |  UNION ALL
            |  SELECT event_id, user_id, ${centsSql("value")} AS value_c
            |  FROM cl WHERE version > 1705276800000000)
            |SELECT CASE WHEN value_c IS NULL THEN 1 ELSE 2 END AS schema_ver,
            |  count(*) AS cnt,
            |  CAST(sum(coalesce(value_c, 0)) AS BIGINT) AS total_c
            |FROM widened GROUP BY 1 ORDER BY 1""".stripMargin))

  // ----------------------------------------------------- type-system policy

  /** JSON payload field extraction (the `_peerdb_data` access path;
    * record_items.go MarshalJSON ↔ get_json_object). */
  val jsonExtract = GraftQuery(
    "q_json_extract",
    "JSON payload field extraction from the props column",
    (s, dir) => t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
           |  CAST(json_extract_string(props, '$.k') AS INT) AS k
           |FROM events ORDER BY event_id""".stripMargin))

  /** Numeric truncation/validation (numeric_truncator.go): values whose
    * integral part exceeds the destination precision become NULL. */
  val numericClamp = GraftQuery(
    "q_numeric_clamp",
    "destination-precision numeric clamping (overflow → NULL + flag)",
    (s, dir) => t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        coalesce(
          when(abs(col("l_extendedprice")) >= 10000, lit(null))
            .otherwise(cents(col("l_extendedprice"))).cast("string"),
          lit("")).as("price_clamped_s"),
        (abs(col("l_extendedprice")) >= 10000).as("was_clamped"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some(s"""SELECT l_orderkey, l_linenumber,
            |  coalesce(CAST(CASE WHEN abs(l_extendedprice) >= 10000
            |    THEN NULL ELSE ${centsSql("l_extendedprice")} END
            |    AS VARCHAR), '') AS price_clamped_s,
            |  abs(l_extendedprice) >= 10000 AS was_clamped
            |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** Date/timestamp clamping to [1900, 9999] (avro_converter.go:384-427,
    * ClickHouse bounds normalize_query.go:81-110) — exercised by shifting
    * years with pure integer arithmetic. */
  val dateClamp = GraftQuery(
    "q_date_clamp",
    "year clamping to the destination-supported [1900,9999] range",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_orderkey"),
        (year(col("o_orderdate")) - (col("o_orderkey") % 40) * lit(10))
          .cast("int").as("y"))
      .withColumn("y_clamped", least(greatest(col("y"), lit(1900)), lit(9999)))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, y,
           |  least(greatest(y, 1900), 9999) AS y_clamped
           |FROM (SELECT o_orderkey,
           |        CAST(year(o_orderdate) - (o_orderkey % 40) * 10 AS INT)
           |          AS y
           |      FROM orders)
           |ORDER BY o_orderkey""".stripMargin))

  /** NaN/±Inf → NULL at serialization (record_items.go:174-207). The NULL
    * happens BEFORE any decimal cast (a vectorized engine would otherwise
    * fault casting NaN). */
  val nanInfNull = GraftQuery(
    "q_nan_inf_null",
    "NaN/Infinity floats null out before the sink",
    (s, dir) => t(s, dir, "events")
      .withColumn("v_raw",
        when(col("event_type") === "error", lit(Double.NaN))
          .when(col("event_type") === "click",
            lit(Double.PositiveInfinity))
          .otherwise(col("value")))
      .withColumn("v_null",
        when(isnan(col("v_raw")) || col("v_raw") === Double.PositiveInfinity
            || col("v_raw") === Double.NegativeInfinity, lit(null))
          .otherwise(col("v_raw")))
      .select(col("event_id"),
        coalesce(cents(col("v_null")).cast("string"), lit(""))
          .as("v_clean_s"))
      .orderBy("event_id"),
    Some(s"""SELECT event_id,
            |  coalesce(CAST(${centsSql("v_null")} AS VARCHAR), '')
            |    AS v_clean_s
            |FROM (SELECT event_id,
            |        CASE WHEN isnan(v_raw) OR v_raw = 'Infinity'::DOUBLE
            |               OR v_raw = '-Infinity'::DOUBLE THEN NULL
            |             ELSE v_raw END AS v_null
            |      FROM (SELECT event_id,
            |              CASE WHEN event_type='error' THEN 'NaN'::DOUBLE
            |                   WHEN event_type='click'
            |                     THEN 'Infinity'::DOUBLE
            |                   ELSE value END AS v_raw
            |            FROM events))
            |ORDER BY event_id""".stripMargin))

  /** PG range/multirange decode breadth (qvalue_convert.go:256-331:
    * ranges replicate as canonical TEXT): synthesize every
    * inclusivity style of int range text from order keys, push them
    * through the engine's parser + discrete-range canonicalization
    * ([[graft.functions.PgText.canonicalIntRange]] — `(a,b]` → `[a+1,b+1)`,
    * degenerate → `empty`) and PG multirange normalization (sort + merge
    * overlapping/adjacent). The oracle reproduces the canonical forms with
    * pure integer arithmetic. */
  val pgRanges = GraftQuery(
    "q_pg_ranges",
    "PG range/multirange text decode + discrete canonicalization",
    (s, dir) => {
      import org.apache.spark.sql.functions.udf
      val canonR = udf(graft.functions.PgText.canonicalIntRange _)
      val canonM = udf(graft.functions.PgText.canonicalIntMultirange _)
      val o = t(s, dir, "orders")
        .withColumn("lo", col("o_orderkey") % 97)
        .withColumn("w", col("o_orderkey") % 9 - 2)
        .withColumn("hi", col("lo") + col("w"))
        .withColumn("style", col("o_orderkey") % 4)
        .withColumn("range_raw", concat(
          when(col("style") === 0 || col("style") === 2, "[").otherwise("("),
          col("lo").cast("string"), lit(","), col("hi").cast("string"),
          when(col("style") === 0 || col("style") === 1, "]").otherwise(")")))
        .withColumn("g", col("o_orderkey") % 6)
        .withColumn("mr_raw", concat(lit("{"), col("range_raw"), lit(",["),
          (col("lo") + col("g")).cast("string"), lit(","),
          (col("lo") + col("g") + 3).cast("string"), lit(")}")))
      o.select(col("o_orderkey"), col("range_raw"),
          canonR(col("range_raw")).as("range_canon"),
          canonM(col("mr_raw")).as("mr_canon"))
        .orderBy("o_orderkey")
    },
    Some("""WITH r AS (
           |  SELECT o_orderkey, lo, w, lo + w AS hi, style,
           |    lo + g AS a2, lo + g + 3 AS b2,
           |    lo + CASE WHEN style IN (1,3) THEN 1 ELSE 0 END AS a,
           |    lo + w + CASE WHEN style IN (0,1) THEN 1 ELSE 0 END AS b,
           |    CASE WHEN style IN (0,2) THEN '[' ELSE '(' END
           |      || lo || ',' || (lo + w) ||
           |      CASE WHEN style IN (0,1) THEN ']' ELSE ')' END AS range_raw
           |  FROM (SELECT o_orderkey, o_orderkey % 97 AS lo,
           |          o_orderkey % 9 - 2 AS w, o_orderkey % 4 AS style,
           |          o_orderkey % 6 AS g
           |        FROM orders)),
           |m AS (
           |  SELECT *,
           |    CASE WHEN a >= b THEN 'empty'
           |         ELSE '[' || a || ',' || b || ')' END AS range_canon,
           |    CASE WHEN a <= a2 THEN a ELSE a2 END AS fa,
           |    CASE WHEN a <= a2 THEN b ELSE b2 END AS fb,
           |    CASE WHEN a <= a2 THEN a2 ELSE a END AS sa,
           |    CASE WHEN a <= a2 THEN b2 ELSE b END AS sb
           |  FROM r)
           |SELECT o_orderkey, range_raw, range_canon,
           |  CASE WHEN range_canon = 'empty'
           |    THEN '{[' || a2 || ',' || b2 || ')}'
           |    WHEN sa <= fb
           |    THEN '{[' || fa || ',' || greatest(fb, sb) || ')}'
           |    ELSE '{[' || fa || ',' || fb || '),[' || sa || ',' || sb
           |      || ')}' END AS mr_canon
           |FROM m ORDER BY o_orderkey""".stripMargin))

  /** PG array-literal decode (convertToStringArray's text half,
    * qvalue_convert.go:334+): synthesize `{bare,"quoted",NULL,"with,comma"}`
    * literals from order columns, parse with
    * [[graft.functions.PgText.parseArrayLiteral]], and project the
    * elements back out — quoting, embedded commas and NULL elements all
    * round-trip. */
  val pgArrayDecode = GraftQuery(
    "q_pg_array_decode",
    "PG array literal text decode (quoted/comma/NULL elements)",
    (s, dir) => {
      import org.apache.spark.sql.functions.udf
      val parse = udf(graft.functions.PgText.parseArrayLiteral _)
      t(s, dir, "orders")
        .withColumn("arr_raw", concat(
          lit("{"), col("o_orderstatus"),
          lit(",\"p-"), col("o_orderpriority"),
          lit("\",NULL,\"q,"), (col("o_orderkey") % 5).cast("string"),
          lit("\"}")))
        .withColumn("arr", parse(col("arr_raw")))
        .select(col("o_orderkey"), col("arr_raw"),
          size(col("arr")).as("n"),
          element_at(col("arr"), 1).as("e1"),
          element_at(col("arr"), 2).as("e2"),
          coalesce(element_at(col("arr"), 3), lit("")).as("e3_s"),
          element_at(col("arr"), 4).as("e4"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |  '{' || o_orderstatus || ',"p-' || o_orderpriority
           |    || '",NULL,"q,' || (o_orderkey % 5) || '"}' AS arr_raw,
           |  4 AS n,
           |  o_orderstatus AS e1,
           |  'p-' || o_orderpriority AS e2,
           |  '' AS e3_s,
           |  'q,' || (o_orderkey % 5) AS e4
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** PostGIS decode (GeoValidate, flow/shared/datatypes/geo.go:10-45:
    * WKB hex → WKT): synthesize point + linestring WKB (little-endian,
    * one EWKB-SRID variant whose SRID strips) from order keys and decode
    * through [[graft.functions.Wkb]]; the oracle builds the expected WKT
    * text directly. */
  val wkbWkt = GraftQuery(
    "q_wkb_wkt",
    "WKB/EWKB hex to WKT geometry decode",
    (s, dir) => {
      import org.apache.spark.sql.functions.udf
      import graft.functions.Wkb
      val pointHex = udf((x: Long, y: Long, srid: Int) =>
        Wkb.toHex(Wkb.pointWkb(x.toDouble, y.toDouble, srid)))
      val lineHex = udf((x: Long, y: Long) =>
        Wkb.toHex(Wkb.lineWkb(Seq((x.toDouble, y.toDouble),
          (x.toDouble + 10, y.toDouble - 3)))))
      val toWkt = udf(Wkb.hexToWkt _)
      t(s, dir, "orders")
        .withColumn("x", col("o_orderkey") % 360 - 180)
        .withColumn("y", col("o_orderkey") % 170 - 85)
        // alternate plain WKB and EWKB+SRID — both decode identically
        .withColumn("srid",
          when(col("o_orderkey") % 2 === 0, 4326).otherwise(0))
        .select(col("o_orderkey"),
          toWkt(pointHex(col("x"), col("y"), col("srid"))).as("wkt_point"),
          toWkt(lineHex(col("x"), col("y"))).as("wkt_line"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |  'POINT (' || x || ' ' || y || ')' AS wkt_point,
           |  'LINESTRING (' || x || ' ' || y || ', ' || (x + 10) || ' '
           |    || (y - 3) || ')' AS wkt_line
           |FROM (SELECT o_orderkey, o_orderkey % 360 - 180 AS x,
           |        o_orderkey % 170 - 85 AS y
           |      FROM orders)
           |ORDER BY o_orderkey""".stripMargin))

  /** PG interval decode (intervalToString,
    * postgres/qvalue_convert.go:195-215): the (micros, days, months)
    * triple renders as the PeerDBInterval JSON with zero fields omitted
    * and integral seconds bare — reproduced relationally by the oracle. */
  val intervalJson = GraftQuery(
    "q_interval_json",
    "PG interval (micros,days,months) to PeerDBInterval JSON",
    (s, dir) => {
      import org.apache.spark.sql.functions.udf
      val ij = udf(graft.functions.PgText.intervalToJson _)
      t(s, dir, "orders")
        .withColumn("micros", (col("o_orderkey") % 90000L) * 1000000L)
        .withColumn("days", (col("o_orderkey") % 40).cast("int"))
        .withColumn("months", (col("o_orderkey") % 30).cast("int"))
        .select(col("o_orderkey"),
          ij(col("micros"), col("days"), col("months"))
            .as("interval_json"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, '{'
           |  || CASE WHEN h <> 0 THEN '"hours":' || h || ',' ELSE '' END
           |  || CASE WHEN m <> 0 THEN '"minutes":' || m || ',' ELSE '' END
           |  || CASE WHEN sec <> 0 THEN '"seconds":' || sec || ','
           |       ELSE '' END
           |  || CASE WHEN d <> 0 THEN '"days":' || d || ',' ELSE '' END
           |  || CASE WHEN mo % 12 <> 0
           |       THEN '"months":' || (mo % 12) || ',' ELSE '' END
           |  || CASE WHEN mo // 12 <> 0
           |       THEN '"years":' || (mo // 12) || ',' ELSE '' END
           |  || '"valid":true}' AS interval_json
           |FROM (SELECT o_orderkey,
           |        (o_orderkey % 90000) // 3600 AS h,
           |        ((o_orderkey % 90000) % 3600) // 60 AS m,
           |        (o_orderkey % 90000) % 60 AS sec,
           |        o_orderkey % 40 AS d,
           |        o_orderkey % 30 AS mo
           |      FROM orders)
           |ORDER BY o_orderkey""".stripMargin))

  /** Oversize value truncation (record_items.go:36,44: >15 MiB strings →
    * ""), threshold scaled down to the fixture sizes. */
  val oversizeTruncate = GraftQuery(
    "q_oversize_truncate",
    "oversize string/JSON truncation at serialization",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"),
        when(length(col("text")) > 300, lit("")).otherwise(col("text"))
          .as("text_capped"),
        length(col("text")).as("n"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
           |  CASE WHEN length(text) > 300 THEN '' ELSE text END
           |    AS text_capped,
           |  length(text) AS n
           |FROM documents ORDER BY doc_id""".stripMargin))

  // ------------------------------------------- interactive-query passthrough
  // (nexus proxies user SQL to the peer — Spark SQL provides the surface;
  //  these prove the classic relational path at scale.)

  /** TPC-H Q1-shaped pricing summary: partial (map-side) aggregation then a
    * 6-group shuffle; integer-cents sums for exactness. The discounted
    * price is rounded to 4 decimals at the row level (basis-point ints). */
  val q1Agg = GraftQuery(
    "q1_agg",
    "grouped aggregation with exact integer sums (TPC-H Q1 shape)",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1999-01-01 00:00:00"))
      .withColumn("qty_c", cents(col("l_quantity")))
      .withColumn("price_c", cents(col("l_extendedprice")))
      .withColumn("disc_price_bp",
        ((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(14,4)") * 10000).cast("bigint"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("qty_c").as("sum_qty_c"),
        sum("price_c").as("sum_price_c"),
        sum("disc_price_bp").as("sum_disc_price_bp"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus"),
    // CAST(sum(..) AS BIGINT): DuckDB sums BIGINT into HUGEINT, which
    // pandas reads as float64 — the driver's value hash then differs from
    // Spark's int64 even when values match (root cause of the r01
    // hash_match failures on every SUM-bearing query).
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100
           |    AS BIGINT)) AS BIGINT) AS sum_qty_c,
           |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
           |    AS BIGINT)) AS BIGINT) AS sum_price_c,
           |  CAST(sum(CAST(CAST(l_extendedprice * (1.0 - l_discount)
           |    AS DECIMAL(14,4)) * 10000 AS BIGINT)) AS BIGINT)
           |    AS sum_disc_price_bp,
           |  count(*) AS cnt
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1999-01-01 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Fact-to-dim join with explicit broadcast of both dims — no shuffle of
    * the orders fact for the dimension side at any scale. */
  val joinAggNation = GraftQuery(
    "q_join_agg_nation",
    "broadcast dim join + grouped rollup (orders⋈customer⋈nation)",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      orders
        .join(broadcast(customer),
          orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation),
          customer("c_nationkey") === nation("n_nationkey"))
        .withColumn("price_c", cents(col("o_totalprice")))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum("price_c").as("total_price_c"))
        .orderBy("n_name")
    },
    Some(s"""SELECT n_name, count(*) AS n_orders,
            |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT)
            |    AS total_price_c
            |FROM orders
            |JOIN customer ON o_custkey = c_custkey
            |JOIN nation ON c_nationkey = n_nationkey
            |GROUP BY n_name ORDER BY n_name""".stripMargin))

  /** Top-K per group window (per-customer top orders). */
  val topkPerCustomer = GraftQuery(
    "q_topk_per_customer",
    "top-3-per-key window ranking",
    (s, dir) => t(s, dir, "orders")
      .withColumn("rk", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_c"))
      .orderBy("o_custkey", "rk"),
    Some(s"""SELECT o_custkey, rk, o_orderkey,
            |  ${centsSql("o_totalprice")} AS price_c
            |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
            |        ORDER BY o_totalprice DESC, o_orderkey) AS rk
            |      FROM orders)
            |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin))

  /** Tumbling-window event-time aggregation — the batch statement of the
    * Structured Streaming windowed agg this engine uses for stream rollups. */
  val windowHourly = GraftQuery(
    "q_window_hourly",
    "tumbling 1-hour event-time window aggregation",
    (s, dir) => t(s, dir, "events")
      .withColumn("hour_s",
        date_format(timestamp_micros(expr("ts div 1000")),
          "yyyy-MM-dd HH:00:00"))
      .withColumn("value_c", cents(col("value")))
      .groupBy("hour_s", "event_type")
      .agg(count(lit(1)).as("cnt"), sum("value_c").as("total_c"))
      .orderBy("hour_s", "event_type"),
    Some(s"""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
            |    '%Y-%m-%d %H:00:00') AS hour_s,
            |  event_type, count(*) AS cnt,
            |  CAST(sum(${centsSql("value")}) AS BIGINT) AS total_c
            |FROM events
            |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Queue-sink record shaping (kafka.go:295-420): the engine-owned half
    * of the Kafka/PubSub path — topic/key/value routing as codegen'd
    * column expressions (the Lua-script parity hook). Payload built by
    * explicit concat, not to_json, so the oracle is byte-identical. */
  val queuePayload = GraftQuery(
    "q_queue_payload",
    "queue-sink record shaping: topic/key/value routing hook",
    (s, dir) => graft.sinks.QueueSink.records(
        changeLog(s, dir),
        topic = concat(lit("cdc.events."), col("event_type")),
        key = col("user_id"),
        value = concat(lit("{\"event_id\":"),
          col("event_id").cast("string"),
          lit(",\"version\":"), col("version").cast("string"), lit("}")))
      .drop("headers")
      .orderBy("topic", "key", "value"),
    Some(s"""SELECT 'cdc.events.' || event_type AS topic,
            |  CAST(user_id AS VARCHAR) AS key,
            |  '{"event_id":' || event_id || ',"version":' || version
            |    || '}' AS value
            |FROM ($changeLogSql)
            |ORDER BY topic, key, value""".stripMargin))

  /** EventHubs-flavored routing (eventhub.go:270-299): each record's hub
    * PARTITION is fnv1a32(partition column value) % partitionCount, and
    * events pack into per-(namespace, hub, partition) EventDataBatches
    * of at most maxPerBatch (hub_batches.go) — the oracle replays the
    * identical FNV fold with DuckDB's list_reduce. One window shuffle
    * on the scope key; the hash itself is a codegen'd aggregate fold. */
  val queueEventHubs = GraftQuery(
    "q_queue_eventhubs",
    "EventHubs routing: FNV-1a partition keys + per-partition batching",
    (s, dir) => graft.sinks.QueueSink.eventHubsRecords(
        changeLog(s, dir),
        namespace = lit("ns1"),
        hub = concat(lit("hub_"), col("event_type")),
        partitionValue = col("user_id"),
        value = concat(lit("{\"event_id\":"),
          col("event_id").cast("string"), lit("}")),
        partitionCount = 8, maxPerBatch = 100,
        order = col("event_id"))
      .orderBy("namespace", "hub", "partition_key", "batch_seq", "value"),
    Some(s"""WITH src AS ($changeLogSql),
            |r AS (SELECT 'ns1' AS namespace,
            |  'hub_' || event_type AS hub,
            |  CAST(user_id AS VARCHAR) AS pstr,
            |  '{"event_id":' || event_id || '}' AS value,
            |  event_id FROM src),
            |h AS (SELECT namespace, hub, value, event_id,
            |  CAST(list_reduce(
            |    list_prepend(CAST(2166136261 AS BIGINT),
            |      list_transform(range(1, len(pstr) + 1),
            |        i -> CAST(ord(pstr[i]) AS BIGINT))),
            |    (acc, c) -> (xor(acc, c) * 16777619) % 4294967296) % 8
            |    AS VARCHAR) AS partition_key FROM r)
            |SELECT namespace, hub, partition_key,
            |  CAST((row_number() OVER (
            |    PARTITION BY namespace, hub, partition_key
            |    ORDER BY event_id) - 1) // 100 AS BIGINT) AS batch_seq,
            |  value
            |FROM h
            |ORDER BY namespace, hub, partition_key, batch_seq, value"""
      .stripMargin))

  /** PubSub-flavored routing (pubsub.go:110-200): ordering keys travel
    * per message and the `ordered` flag mirrors the publisher's
    * EnableMessageOrdering switch — enabled exactly for non-empty keys
    * (deletes here publish unordered, like records whose Lua script
    * returns no key). Pure codegen'd column work, zero shuffles. */
  val queuePubSub = GraftQuery(
    "q_queue_pubsub",
    "PubSub routing: ordering keys + per-message ordering flag",
    (s, dir) => graft.sinks.QueueSink.pubSubRecords(
        changeLog(s, dir),
        topic = concat(lit("cdc."), col("event_type")),
        orderingKey = when(col("rtype") === 2, lit(null))
          .otherwise(col("user_id")),
        value = concat(lit("{\"event_id\":"),
          col("event_id").cast("string"), lit("}")))
      .orderBy("topic", "ordering_key", "value"),
    Some(s"""SELECT 'cdc.' || event_type AS topic,
            |  CASE WHEN rtype = 2 THEN ''
            |       ELSE CAST(user_id AS VARCHAR) END AS ordering_key,
            |  '{"event_id":' || event_id || '}' AS value,
            |  (CASE WHEN rtype = 2 THEN '' ELSE CAST(user_id AS VARCHAR)
            |   END) <> '' AS ordered
            |FROM ($changeLogSql)
            |ORDER BY topic, ordering_key, value""".stripMargin))

  /** Per-record user transform (the Lua `script` stage,
    * flow/pua/stream_adapter.go:41-85) as a typed Scala closure over
    * `Dataset[ChangeRecord]`: drop deletes, reroute each record to a
    * shard table — whole-record logic that runs where the Lua pool sat.
    * The oracle replays the same logic relationally. */
  val rowTransform = GraftQuery(
    "q_row_transform",
    "Lua-parity row transform: mutate/drop/route a typed change stream",
    (s, dir) => {
      import graft.model.ChangeRecord
      import graft.transform.RowTransform
      import RowTransform.changeRecordEncoder
      val ds = changeLog(s, dir).select(
        col("rtype").as("recordType"),
        col("event_id").as("checkpointId"),
        col("event_id").cast("string").as("checkpointText"),
        col("version").as("commitTimeMicros"),
        expr("event_id DIV 100").as("transactionId"),
        lit("public.events").as("sourceTable"),
        lit("events").as("destinationTable"),
        concat(lit("{\"user_id\":"), col("user_id").cast("string"),
          lit("}")).as("data"),
        lit(null).cast("string").as("matchData"),
        array().cast("array<string>").as("unchangedToastColumns"))
        .as[ChangeRecord](changeRecordEncoder)
      RowTransform(ds) { r =>
        if (r.recordType == ChangeRecord.TypeDelete) None
        else Some(r.copy(
          destinationTable = s"events_shard_${r.checkpointId % 4}"))
      }.toDF()
        .select(col("checkpointId").as("checkpoint_id"),
          col("destinationTable").as("dest_table"),
          col("recordType").as("record_type"))
        .orderBy("checkpoint_id")
    },
    Some(s"""SELECT event_id AS checkpoint_id,
            |  'events_shard_' || (event_id % 4) AS dest_table,
            |  rtype AS record_type
            |FROM ($changeLogSql)
            |WHERE rtype <> 2
            |ORDER BY checkpoint_id""".stripMargin))

  /** The embedded Lua interpreter under the SQL oracle: a user
    * `onRecord` routing script (the reference's script surface,
    * flow/pua/peerdb.go + kafka.go:340-390) runs per record through
    * [[graft.transform.LuaQueue]] — json.encode over row userdata,
    * kind dispatch, integer arithmetic, string concat — and the oracle
    * replays the same routing relationally. One interpreter per Spark
    * partition; the per-record work is the script itself. */
  val luaRoute = GraftQuery(
    "q_lua_route",
    "lua onRecord routing: the embedded interpreter vs the SQL oracle",
    (s, dir) => {
      // NOT pre-spread (unlike the decimal/pattern-heavy lua queries):
      // this script's assembly and routing are light, and the measured
      // final pair put the pre-assembly exchange at a net loss here —
      // LuaParallelism's own post-assembly spread is the cheaper shape
      val batch = changeLog(s, dir).select(
        col("rtype").cast("int").as("recordType"),
        col("event_id").as("checkpointId"),
        col("version").as("commitTimeMicros"),
        expr("event_id DIV 100").as("transactionId"),
        lit("public.events").as("sourceTable"),
        col("event_type").as("destinationTable"),
        concat(lit("{\"user_id\":"), col("user_id").cast("string"),
          lit(",\"event_id\":"), col("event_id").cast("string"),
          lit("}")).as("data"),
        lit(null).cast("string").as("matchData"),
        array().cast("array<string>").as("unchangedToastColumns"))
      val script = """
        local json = require "json"
        function onRecord(r)
          if r.kind == "delete" then return nil end
          local key = tostring(r.row.user_id % 8)
          if r.kind == "update" then
            return { topic = "hot." .. r.target, key = key,
                     value = json.encode(r.row) }
          end
          return { key = key, value = json.encode(r.row) }
        end"""
      graft.transform.LuaQueue.records(batch, script)
        // the shaped value is BYTES (msgpack payloads ship verbatim);
        // this script emits JSON text, so decode for the SQL oracle
        .select(col("topic"), col("key"),
          col("value").cast("string").as("value"))
        .orderBy("topic", "key", "value")
    },
    Some(s"""SELECT CASE WHEN rtype = 1 THEN 'hot.' || event_type
            |            ELSE event_type END AS topic,
            |  CAST(user_id % 8 AS VARCHAR) AS key,
            |  '{"user_id":' || user_id || ',"event_id":' || event_id
            |    || '}' AS value
            |FROM ($changeLogSql)
            |WHERE rtype <> 2
            |ORDER BY topic, key, value""".stripMargin))

  /** The Lua DECIMAL userdata under the oracle gate: a routing script
    * doing exact NUMERIC arithmetic (peerdb.Decimal — shopspring
    * semantics restated over java BigDecimal: scale-shift division,
    * exact multiply/add, value-ordering comparisons, IntPart
    * truncation) routes orders by a price threshold and emits a
    * tax-adjusted integer-cents total; DuckDB replays the same math
    * relationally. Everything stays exact on both sides — cents ride
    * integers, the 5% uplift is *105 // 100 — so the hash compare
    * pins the decimal semantics, not a float rendering. */
  val luaDecimal = GraftQuery(
    "q_lua_decimal",
    "lua decimal userdata arithmetic: exact NUMERIC routing vs the SQL oracle",
    (s, dir) => {
      val batch = spreadScan(t(s, dir, "orders")).select(
        lit(graft.model.ChangeRecord.TypeInsert).as("recordType"),
        col("o_orderkey").cast("long").as("checkpointId"),
        (col("o_orderkey").cast("long") * 1000L).as("commitTimeMicros"),
        expr("o_orderkey DIV 100").cast("long").as("transactionId"),
        lit("public.orders").as("sourceTable"),
        lit("orders").as("destinationTable"),
        concat(lit("{\"okey\":"), col("o_orderkey").cast("string"),
          lit(",\"cents\":"), cents(col("o_totalprice")).cast("string"),
          lit("}")).as("data"),
        lit(null).cast("string").as("matchData"),
        array().cast("array<string>").as("unchangedToastColumns"))
      val script = """
        function onRecord(r)
          local price = peerdb.Decimal(r.row.cents) / 100
          local total = price * "1.05"
          local topic = "orders.small"
          if price >= peerdb.Decimal("150000") then
            topic = "orders.big"
          end
          return { topic = topic, key = tostring(r.row.okey),
                   value = tostring((total * 100).int64) }
        end"""
      graft.transform.LuaQueue.records(batch, script)
        .select(col("topic"), col("key"),
          col("value").cast("string").as("value"))
        .orderBy("topic", "key", "value")
    },
    Some(s"""SELECT CASE WHEN ${centsSql("o_totalprice")} >= 15000000
            |            THEN 'orders.big' ELSE 'orders.small'
            |       END AS topic,
            |  CAST(o_orderkey AS VARCHAR) AS key,
            |  CAST((${centsSql("o_totalprice")} * 105) // 100
            |    AS VARCHAR) AS value
            |FROM orders
            |ORDER BY topic, key, value""".stripMargin))

  /** The CDC adapt stream + Lua 5.1 patterns under the oracle gate: a
    * `transformRecord` script (flowable.go:485-512) mutates each
    * order's row image IN PLACE — splits the priority with
    * string.match("(%d+)-(%a+)"), lowercases the word, applies an
    * exact 10% decimal uplift to integer cents — and the query reads
    * the TRANSFORMED images back out of the stream, exactly what raw
    * staging would persist. DuckDB replays the same shaping
    * relationally (regexp_extract + integer math), so the hash compare
    * pins the pattern engine, the in-place row mutation, and the
    * dirty-image re-encode in one pass. */
  val luaTransform = GraftQuery(
    "q_lua_transform",
    "lua transformRecord adapt stage: pattern split + decimal uplift " +
      "vs the SQL oracle",
    (s, dir) => {
      val batch = spreadScan(t(s, dir, "orders")).select(
        lit(graft.model.ChangeRecord.TypeInsert).as("recordType"),
        col("o_orderkey").cast("long").as("checkpointId"),
        (col("o_orderkey").cast("long") * 1000L).as("commitTimeMicros"),
        expr("o_orderkey DIV 100").cast("long").as("transactionId"),
        lit("public.orders").as("sourceTable"),
        lit("orders").as("destinationTable"),
        concat(lit("{\"okey\":"), col("o_orderkey").cast("string"),
          lit(",\"prio\":\""), col("o_orderpriority"), lit("\""),
          lit(",\"cents\":"), cents(col("o_totalprice")).cast("string"),
          lit("}")).as("data"),
        lit(null).cast("string").as("matchData"),
        array().cast("array<string>").as("unchangedToastColumns"))
      val script = """
        function transformRecord(r)
          local rank, word = string.match(r.row.prio, "(%d+)-(%a+)")
          r.row.rank = tonumber(rank)
          r.row.word = string.lower(word)
          r.row.cents = (peerdb.Decimal(r.row.cents) * "1.1").int64
        end"""
      graft.transform.LuaAdapt.records(batch, script)
        // ONE json parse per row (from_json), not one per projected
        // field — 4× get_json_object would re-parse the image 4 times
        .select(from_json(col("data"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "okey BIGINT, rank BIGINT, word STRING, cents BIGINT"))
          .as("j"))
        .select(col("j.okey").as("okey"), col("j.rank").as("rank"),
          col("j.word").as("word"), col("j.cents").as("cents"))
        .orderBy("okey")
    },
    Some(s"""SELECT o_orderkey AS okey,
            |  CAST(regexp_extract(o_orderpriority,
            |    '([0-9]+)-([A-Za-z]+)', 1) AS BIGINT) AS rank,
            |  lower(regexp_extract(o_orderpriority,
            |    '([0-9]+)-([A-Za-z]+)', 2)) AS word,
            |  (${centsSql("o_totalprice")} * 11) // 10 AS cents
            |FROM orders
            |ORDER BY okey""".stripMargin))

  /** The QRep TYPED bridge under the oracle gate: `transformRow`
    * (flowable.go:756-771) mutates real Spark types in place —
    * DECIMAL(12,2) through the exact decimal userdata (multiply, then
    * write-back at the column's scale, half-up), TIMESTAMP through the
    * time userdata's epoch accessors, strings through the pattern
    * engine — and DuckDB replays the same shaping relationally. The
    * hash compare pins both directions of the
    * [[graft.transform.LuaRowTransform]] type mapping. */
  val luaTyped = GraftQuery(
    "q_lua_typed",
    "qrep transformRow typed bridge: decimal/timestamp/pattern " +
      "round-trips vs the SQL oracle",
    (s, dir) => {
      val src = spreadScan(t(s, dir, "orders")).select(
        col("o_orderkey").cast("long").as("okey"),
        col("o_totalprice").cast("decimal(12,2)").as("price"),
        col("o_orderdate").as("ts"),
        lit(0L).as("day"),
        col("o_orderpriority").as("word"))
      val script = """
        function transformRow(row)
          row.price = row.price * "1.05"
          row.day = row.ts.unix_second // 86400
          row.word = string.lower(string.match(row.word, "%a+"))
        end"""
      graft.transform.LuaRowTransform.rows(src, script)
        .select(col("okey"),
          (col("price") * 100).cast("long").as("cents"),
          col("day"), col("word"))
        .orderBy("okey")
    },
    Some(s"""SELECT o_orderkey AS okey,
            |  (${centsSql("o_totalprice")} * 105 + 50) // 100 AS cents,
            |  CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day,
            |  lower(regexp_extract(o_orderpriority, '[A-Za-z]+'))
            |    AS word
            |FROM orders
            |ORDER BY okey""".stripMargin))

  /** QRep → queue routing under the oracle gate (kafka/qrep.go:23-120):
    * each pulled TYPED row wraps as an InsertRecord and the script's
    * `onRecord` routes topic/key/value — nil drops, topic defaults by
    * modulus here, the value concatenates typed fields. The relational
    * image of [[graft.transform.LuaQueue.typedRecords]], which the
    * wire specs ship to live kafka/pubsub/es fixtures. One
    * mapPartitions stage (interpreter per partition), no shuffle
    * before the presentation sort. */
  val qrepQueue = GraftQuery(
    "q_qrep_queue",
    "QRep queue routing: typed rows through onRecord " +
      "(topic/key/value, nil drops)",
    (s, dir) => {
      // NOT pre-spread — same measured verdict as q_lua_route (light
      // per-row work; the operator's own spread is the cheaper shape)
      val src = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        col("o_orderpriority").as("prio"),
        cents(col("o_totalprice")).as("cents"))
      val script = """
        function onRecord(r)
          if r.row.okey % 10 == 0 then return nil end
          return { topic = "t" .. tostring(r.row.okey % 4),
                   key = tostring(r.row.okey),
                   value = r.row.prio .. "|" .. tostring(r.row.cents) }
        end"""
      graft.transform.LuaQueue.typedRecords(src, script,
          sourceTable = "orders", destTable = "orders")
        .select(col("key").cast("long").as("okey"),
          col("topic"),
          col("value").cast("string").as("payload"))
        .orderBy("okey")
    },
    Some(s"""SELECT o_orderkey AS okey,
            |  't' || CAST(o_orderkey % 4 AS VARCHAR) AS topic,
            |  o_orderpriority || '|' ||
            |    CAST(${centsSql("o_totalprice")} AS VARCHAR) AS payload
            |FROM orders
            |WHERE o_orderkey % 10 <> 0
            |ORDER BY okey""".stripMargin))

  /** The nexus ExecutePeer surface under the oracle gate
    * (analyzer/src/lib.rs:510-541 `check_execute_peer`,
    * server/src/main.rs:412-423 → `QueryExecutor::execute_raw`):
    * `EXECUTE peer $$query$$` ships the statement to the peer — here
    * a parquet peer, so the text parses locally and every unqualified
    * relation binds to the peer's OWN tables (the executor-side
    * namespace after the proxy's qualifier strip). The oracle runs
    * the identical text, so the routed plan must equal direct local
    * execution. Live-peer legs (raw pg/mysql dialect, command tags,
    * warehouse rowsets) are pinned by ExecutePeerSpec. */
  val executePeer = GraftQuery(
    "q_execute_peer",
    "EXECUTE peer $$query$$: peer-namespace execution of a raw " +
      "statement (ExecutePeer)",
    (s, dir) => {
      val cat = graft.mirror.GraftSql.peersFor(s)
      cat.drop("qepeer")
      cat.create(graft.mirror.Peer("qepeer", "parquet",
        Map("path" -> dir)))
      val stmt = "EXECUTE qepeer $$ SELECT r.r_name AS r_name, " +
        "count(*) AS nations FROM nation n JOIN region r " +
        "ON n.n_regionkey = r.r_regionkey " +
        "GROUP BY r.r_name ORDER BY r.r_name $$"
      val plan = graft.mirror.GraftSql.executePeerPlan(s,
        s.sessionState.sqlParser.parsePlan, stmt).getOrElse(
        throw new IllegalStateException("EXECUTE peer did not route"))
      org.apache.spark.sql.GraftShims.ofRows(s, plan)
    },
    Some("""SELECT r.r_name AS r_name, count(*) AS nations
           |FROM nation n JOIN region r
           |  ON n.n_regionkey = r.r_regionkey
           |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin))

  /** Skew mitigation: two-phase salted aggregation over LOW-cardinality
    * keys (3 return flags across all of lineitem — the shape where a
    * plain groupBy sends a third of 100 TB through three reducers).
    * Partial sums per (key, salt) spread the reduce 16-way; the final
    * combine touches keys×salt rows. Result provably equals the plain
    * GROUP BY — which is exactly what the oracle runs. */
  val skewAgg = GraftQuery(
    "q_skew_agg",
    "salted two-phase aggregation over skewed low-cardinality keys",
    (s, dir) => graft.operators.Skew.saltedAggregate(
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), cents(col("l_quantity")).as("qty_c")),
        keys = Seq("l_returnflag"),
        aggs = Map("sum_qty_c" -> col("qty_c"), "cnt" -> lit(1)),
        saltBuckets = 16)
      .orderBy("l_returnflag"),
    Some(s"""SELECT l_returnflag,
            |  CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_c,
            |  count(*) AS cnt
            |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Elasticsearch `_bulk` shaping (flow/connectors/elasticsearch/):
    * latest-per-key batch dedup, then one action line per record with
    * `_id` = PK (natural upsert) — deletes as delete actions with empty
    * source. The engine-owned half of the ES sink as a verifiable
    * relation. */
  val esBulk = GraftQuery(
    "q_es_bulk",
    "Elasticsearch bulk-action shaping (_id from PK, delete actions)",
    (s, dir) => {
      val latest = latestPerKey(changeLog(s, dir))
      graft.sinks.EsSink.bulkRecords(
          latest.withColumn("src_json",
            concat(lit("{\"user_id\":"), col("user_id").cast("string"),
              lit(",\"event_type\":\""), col("event_type"),
              lit("\",\"value_c\":"),
              cents(col("value")).cast("string"), lit("}"))),
          index = "events",
          id = col("user_id"),
          source = col("src_json"),
          deleted = col("rtype") === 2)
        .withColumn("es_id",
          expr("CAST(get_json_object(action, '$.index._id') AS BIGINT)"))
        .withColumn("es_id", coalesce(col("es_id"), expr(
          "CAST(get_json_object(action, '$.delete._id') AS BIGINT)")))
        .select("es_id", "action", "source")
        .orderBy("es_id")
    },
    Some(s"""SELECT es_id, CASE WHEN rtype = 2
            |    THEN '{"delete":{"_index":"events","_id":"' || es_id
            |      || '"}}'
            |    ELSE '{"index":{"_index":"events","_id":"' || es_id
            |      || '"}}' END AS action,
            |  CASE WHEN rtype = 2 THEN ''
            |    ELSE '{"user_id":' || es_id || ',"event_type":"'
            |      || event_type || '","value_c":'
            |      || ${centsSql("value")} || '}' END AS source
            |FROM (SELECT user_id AS es_id, event_type, value, rtype,
            |        ROW_NUMBER() OVER (PARTITION BY user_id
            |          ORDER BY version DESC, event_id DESC) AS rn
            |      FROM ($changeLogSql))
            |WHERE rn = 1
            |ORDER BY es_id""".stripMargin))

  /** Column profiling (the ANALYZE TABLE / stats-collection shape next
    * to [[dataQuality]]'s constraint checks): one scan computes per-
    * column null counts, distinct counts and integer min/max — the
    * statistics a catalog publishes for CBO and that a replication
    * engine compares source-vs-dest after a full sync. All columns
    * profile in ONE pass (a single wide aggregate, map-side partial). */
  val profileTable = GraftQuery(
    "q_profile_table",
    "one-pass column profile of orders: nulls, distincts, min/max",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("price_c",
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      val prof = o.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("nn_cust"),
        countDistinct("o_custkey").as("nd_cust"),
        min("o_custkey").as("min_cust"), max("o_custkey").as("max_cust"),
        countDistinct("o_orderstatus").as("nd_status"),
        countDistinct("o_orderpriority").as("nd_prio"),
        min("price_c").as("min_price_c"), max("price_c").as("max_price_c"))
      prof.selectExpr("n_rows", "nn_cust", "nd_cust", "min_cust",
        "max_cust", "nd_status", "nd_prio", "min_price_c", "max_price_c")
    },
    Some("""SELECT count(*) AS n_rows,
           |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS nn_cust,
           |  count(DISTINCT o_custkey) AS nd_cust,
           |  min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
           |  count(DISTINCT o_orderstatus) AS nd_status,
           |  count(DISTINCT o_orderpriority) AS nd_prio,
           |  min(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
           |    AS BIGINT)) AS min_price_c,
           |  max(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
           |    AS BIGINT)) AS max_price_c
           |FROM orders""".stripMargin))

  /** Data-quality constraint audit (the deequ/dbt-test shape): PK
    * uniqueness, referential integrity both directions, temporal sanity
    * and null-rate checks computed as one unioned violations table —
    * the per-increment audit a 100 TB replication publishes next to the
    * data. Each check is a filter-aggregate or an anti-join keyed on the
    * join column; the union is |checks| rows. */
  val dataQuality = GraftQuery(
    "q_data_quality",
    "constraint audit: PK/FK/temporal/null checks as a violations table",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val e = t(s, dir, "events")
      val d = t(s, dir, "documents")
      def row(name: String, violations: DataFrame, total: DataFrame) =
        violations.crossJoin(total)
          .select(lit(name).as("check_name"), col("violations"),
            col("total"))
      val checks = Seq(
        row("fk_lineitem_has_order",
          l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti")
            .agg(count(lit(1)).as("violations")),
          l.agg(count(lit(1)).as("total"))),
        row("null_event_props",
          e.filter(col("props").isNull || col("props") === "")
            .agg(count(lit(1)).as("violations")),
          e.agg(count(lit(1)).as("total"))),
        row("orders_without_items",
          o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
            .agg(count(lit(1)).as("violations")),
          o.agg(count(lit(1)).as("total"))),
        row("pk_unique_orders",
          o.agg((count(lit(1)) - countDistinct("o_orderkey"))
            .as("violations")),
          o.agg(count(lit(1)).as("total"))),
        row("ship_before_order",
          l.join(o, l("l_orderkey") === o("o_orderkey"))
            .filter(col("l_shipdate") < col("o_orderdate"))
            .agg(count(lit(1)).as("violations")),
          l.agg(count(lit(1)).as("total"))),
        row("unique_doc_text",
          d.agg((count(lit(1)) - countDistinct("text")).as("violations")),
          d.agg(count(lit(1)).as("total"))))
      checks.reduce(_ unionByName _)
        .withColumn("rate_pm",
          expr("violations * 1000 DIV total"))
        .orderBy("check_name")
    },
    Some("""WITH c AS (
           |  SELECT 'fk_lineitem_has_order' AS check_name,
           |    (SELECT count(*) FROM lineitem WHERE NOT EXISTS
           |      (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
           |      AS violations,
           |    (SELECT count(*) FROM lineitem) AS total
           |  UNION ALL
           |  SELECT 'null_event_props',
           |    (SELECT count(*) FROM events
           |     WHERE props IS NULL OR props = ''),
           |    (SELECT count(*) FROM events)
           |  UNION ALL
           |  SELECT 'orders_without_items',
           |    (SELECT count(*) FROM orders WHERE NOT EXISTS
           |      (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)),
           |    (SELECT count(*) FROM orders)
           |  UNION ALL
           |  SELECT 'pk_unique_orders',
           |    (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders),
           |    (SELECT count(*) FROM orders)
           |  UNION ALL
           |  SELECT 'ship_before_order',
           |    (SELECT count(*) FROM lineitem JOIN orders
           |       ON l_orderkey = o_orderkey
           |     WHERE l_shipdate < o_orderdate),
           |    (SELECT count(*) FROM lineitem)
           |  UNION ALL
           |  SELECT 'unique_doc_text',
           |    (SELECT count(*) - count(DISTINCT text) FROM documents),
           |    (SELECT count(*) FROM documents))
           |SELECT check_name, CAST(violations AS BIGINT) AS violations,
           |  CAST(total AS BIGINT) AS total,
           |  CAST(violations AS BIGINT) * 1000 // CAST(total AS BIGINT)
           |    AS rate_pm
           |FROM c ORDER BY check_name""".stripMargin))

  /** peerdb_stats per-destination-table operation counts — the exact
    * aggregate [[graft.mirror.StatsCatalog.tableCountsFrame]] that the
    * mirror collects into `cdc_table_aggregate_counts` each batch
    * (AddCDCBatchTablesForFlow, monitoring.go:170-243). The change log is
    * fanned out over a synthetic 4-table TableMapping so the per-table
    * grouping is exercised; one map-side-combined hash aggregate. */
  val statsTableCounts = GraftQuery(
    "q_stats_tablecounts",
    "peerdb_stats table aggregate counts: per-table insert/update/delete",
    (s, dir) => graft.mirror.StatsCatalog.tableCountsFrame(
      changeLog(s, dir).withColumn("dest_table",
        concat(lit("public.t"), (col("user_id") % 4).cast("string"))),
      "dest_table", "rtype")
      .orderBy("destination_table_name"),
    Some(s"""SELECT 'public.t' || CAST(user_id % 4 AS VARCHAR)
            |    AS destination_table_name,
            |  CAST(sum(CASE WHEN rtype = 0 THEN 1 ELSE 0 END) AS BIGINT)
            |    AS inserts_count,
            |  CAST(sum(CASE WHEN rtype = 1 THEN 1 ELSE 0 END) AS BIGINT)
            |    AS updates_count,
            |  CAST(sum(CASE WHEN rtype = 2 THEN 1 ELSE 0 END) AS BIGINT)
            |    AS deletes_count,
            |  count(*) AS total_count
            |FROM ($changeLogSql) WHERE rtype <= 2
            |GROUP BY 1 ORDER BY destination_table_name""".stripMargin))

  /** peerdb_stats per-batch bookkeeping — the aggregate
    * [[graft.mirror.StatsCatalog.batchInfoFrame]] behind
    * UpdateNumRowsAndEndLSNForCDCBatch (monitoring.go:83-103), run over
    * the whole changefeed as batch-history backfill: rows per batch, end
    * LSN, first commit time. Groups on the batch id, so the shuffle is as
    * wide as the batch count — trivially scale-safe. */
  val statsBatchInfo = GraftQuery(
    "q_stats_batchinfo",
    "peerdb_stats batch bookkeeping: rows / end-LSN / first-commit per batch",
    (s, dir) => graft.mirror.StatsCatalog.batchInfoFrame(
      changeLog(s, dir).withColumn("batch", expr("event_id DIV 1000")),
      "batch", "event_id", "version")
      .orderBy("batch_id"),
    Some(s"""SELECT event_id // 1000 AS batch_id,
            |  count(*) AS rows_in_batch,
            |  max(event_id) AS batch_end_lsn,
            |  min(version) AS first_row_commit_time
            |FROM ($changeLogSql)
            |GROUP BY 1 ORDER BY batch_id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(
    projectionExclude, filterWatermark, partitionNtile, partitionMinMax,
    partitionRowChunk, dedupLatest, normalizeSoftDelete, normalizeFinal,
    toastBackfill, pkUpdateUnion, rawChangefeed, mergeUpsert, schemaEvolution,
    pgoutputDecode, binlogDecode, jsonExtract, numericClamp, dateClamp,
    nanInfNull,
    oversizeTruncate, pgRanges, pgArrayDecode, bsonNormalize, wkbWkt,
    intervalJson, gtidMerge,
    q1Agg, joinAggNation, topkPerCustomer, windowHourly, queuePayload,
    queueEventHubs, queuePubSub,
    rowTransform, luaRoute, luaDecimal, luaTransform, luaTyped,
    qrepQueue,
    partitionCtid, xminScan, esBulk, skewAgg, executePeer,
    dataQuality,
    profileTable, statsTableCounts, statsBatchInfo)
}
