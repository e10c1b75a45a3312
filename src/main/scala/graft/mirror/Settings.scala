package graft.mirror

import org.apache.spark.sql.SparkSession

/** Deployment-wide dynamic settings — the reference's dynamic-config
  * catalog (`flow/internal/dynamicconf.go`: a table of named settings
  * with defaults, value types and descriptions, overridable per
  * deployment and read at decision points). Spark restatement: the
  * catalog is this object's `all` table; overrides live in the session
  * conf under `spark.graft.<name>` (settable at runtime with plain
  * `SET spark.graft.… = …`, Spark's own dynamic-config channel), and
  * every getter resolves override-else-default exactly like
  * `dynLookup`. `SHOW SETTINGS` on the SQL facade lists the catalog
  * with current values, the `peerdb_internal` introspection surface.
  *
  * Only settings this engine actually reads are declared — no
  * aspirational rows. Defaults mirror dynamicconf.go where the setting
  * restates a reference one (lines cited per entry).
  */
object Settings {

  final case class Setting(
      name: String, default: Option[String], valueType: String,
      description: String)

  /** The catalog. Names are suffixes under `spark.graft.`. */
  val all: Seq[Setting] = Seq(
    Setting("catalog.dir", None, "string",
      "Durable peer/mirror catalog directory; unset = in-memory DDL"),
    Setting("mirror.max_batch_size", Some("250000"), "uint",
      "Default CDC micro-batch record cap when CREATE MIRROR omits " +
        "max_batch_size (PEERDB_CDC_MAX_BATCH_SIZE semantics)"),
    Setting("mirror.raw_batch_cleanup_threshold", Some("0"), "int",
      "Normalized batches to retain in the raw staging table; after " +
        "normalize, batch partitions older than batch_id minus this " +
        "are deleted, 0 disables " +
        "(PEERDB_POSTGRES_RAW_BATCH_CLEANUP_THRESHOLD, " +
        "dynamicconf.go:531)"),
    Setting("alerting.gap_minutes", Some("15"), "uint",
      "Minimum minutes between repeats of one alert key per sender; " +
        "0 disables alerting (PEERDB_ALERTING_GAP_MINUTES, " +
        "dynamicconf.go:244)"),
    Setting("alerting.slot_lag_threshold", Some("5000"), "uint",
      "Slot-lag alert threshold (PEERDB_SLOT_LAG_MB_ALERT_THRESHOLD, " +
        "dynamicconf.go:252; unit = records for the WAL gauge here)"),
    Setting("alerting.open_connections_threshold", Some("5"), "uint",
      "Open-connections alert threshold " +
        "(PEERDB_PGPEER_OPEN_CONNECTIONS_ALERT_THRESHOLD, " +
        "dynamicconf.go:260)"),
    Setting("alerting.interval_since_last_normalize_minutes",
      Some("240"), "uint",
      "Minutes since a mirror's last completed normalize before the " +
        "staleness alert fires; 0 disables this check " +
        "(PEERDB_INTERVAL_SINCE_LAST_NORMALIZE_THRESHOLD_MINUTES, " +
        "dynamicconf.go:341; alerting.go:243-279)"),
    Setting("maintenance.mode", Some("false"), "bool",
      "Deployment maintenance mode: while true, state-changing mirror " +
        "statements (CREATE/EXECUTE/RESYNC/PAUSE/RESUME/DROP MIRROR) " +
        "are refused; introspection still works " +
        "(PEERDB_MAINTENANCE_MODE_ENABLED, dynamicconf.go:868; " +
        "handlers deny with ErrUnderMaintenance, " +
        "flow/cmd/handler.go:429-435)"),
    Setting("mirror.enable_wal_heartbeat", Some("false"), "bool",
      "Emit a tiny logical message on the capture source every " +
        "heartbeat interval while the pump runs: an IDLE source " +
        "otherwise accumulates WAL behind the slot's restart_lsn " +
        "until some unrelated transaction lets the consumer ack " +
        "forward (PEERDB_ENABLE_WAL_HEARTBEAT, dynamicconf.go:99)"),
    Setting("mirror.wal_heartbeat_query",
      Some("SELECT pg_logical_emit_message(true,'peerdb_heartbeat','')"),
      "string",
      "The heartbeat statement (PEERDB_WAL_HEARTBEAT_QUERY, " +
        "dynamicconf.go:105-110); the default logical message travels " +
        "the slot and decodes as a no-op"),
    Setting("mirror.wal_heartbeat_interval_ms", Some("600000"), "uint",
      "Milliseconds between WAL heartbeats (the reference schedules " +
        "SendWALHeartbeat every 10 minutes, flowable.go:971)"),
    Setting("metrics.otlp_endpoint", Some(""), "string",
      "OTLP/HTTP collector base URL (e.g. http://otel:4318): when " +
        "set, every EXECUTE/RESUME MIRROR attaches an OTLP exporter " +
        "for its gauge set — the enabled path of otel_manager.go " +
        "(OTEL_EXPORTER_OTLP_PROTOCOL http/protobuf); empty disables"),
    Setting("queue.parallelism", Some("0"), "uint",
      "PEERDB_QUEUE_PARALLELISM (dynamicconf.go:199): width of the " +
        "per-partition Lua interpreter fan-out on the queue/adapt " +
        "script stages — the reference's LuaPool size mapped onto " +
        "the small-batch spread repartition; 0 uses the session's " +
        "defaultParallelism"),
    Setting("queue.force_topic_creation", Some("false"), "bool",
      "PEERDB_QUEUE_FORCE_TOPIC_CREATION (dynamicconf.go:236): a " +
        "kafka topic the broker doesn't know gets created (1 " +
        "partition, replication 3) instead of failing the batch; " +
        "the per-url force_topic_creation param overrides"),
    Setting("qrep.bytes_per_avro_file", Some("1000000000"), "uint",
      "PEERDB_S3_BYTES_PER_AVRO_FILE (dynamicconf.go:228): staged/" +
        "destination Avro files roll at this pre-compression byte " +
        "bound — large unpartitioned initial loads otherwise " +
        "produce single arbitrarily large files; 0 writes one file " +
        "per partition; the per-mirror stage_bytes_per_file WITH " +
        "option overrides"),
    Setting("qrep.s3_uuid_prefix", Some("false"), "bool",
      "PEERDB_S3_UUID_PREFIX (dynamicconf.go:841): file-Avro QRep " +
        "destinations (dest_url 's3path://…') write under a fresh " +
        "uuid prefix per round — keys never collide across job " +
        "re-creations, at the cost of retried rounds appending new " +
        "files instead of rewriting; the per-mirror s3_uuid_prefix " +
        "WITH option overrides"),
    Setting("mongo.excluded_operation_types", Some(""), "string",
      "Comma-separated MongoDB change stream operation types to " +
        "exclude from CDC (insert, update, replace, delete) — a " +
        "$match stage on the stream; invalid entries are ignored " +
        "(PEERDB_MONGODB_EXCLUDED_OPERATION_TYPES, " +
        "dynamicconf.go:522)"),
    Setting("mirror.wal_sender_timeout", Some(""), "string",
      "wal_sender_timeout for the PostgreSQL replication session: a " +
        "bare integer is milliseconds, any postgres duration works, " +
        "'NONE' or empty leaves the server default " +
        "(PEERDB_POSTGRES_WAL_SENDER_TIMEOUT, dynamicconf.go:456; " +
        "applied as a startup parameter like " +
        "postgres_source.go:44-80)"),
    Setting("mirror.application_name_per_mirror", Some("false"), "bool",
      "When true, the mirror's PostgreSQL REPLICATION session " +
        "carries application_name = the flow name, so " +
        "pg_stat_activity attributes it per mirror " +
        "(PEERDB_APPLICATION_NAME_PER_MIRROR_NAME, " +
        "dynamicconf.go:349; postgres.go:87-97). Query sessions name " +
        "themselves with an application_name=<name> param on the " +
        "peer URL"),
    Setting("mirror.source_schema_as_destination_column", Some("false"),
      "bool",
      "Ingest the source table's schema name as a " +
        "_peerdb_source_schema destination column — the " +
        "disambiguator when multiple source tables route into one " +
        "destination table " +
        "(PEERDB_SOURCE_SCHEMA_AS_DESTINATION_COLUMN, " +
        "dynamicconf.go:398; items injection postgres/cdc.go:189-202, " +
        "extraction clickhouse/normalize_query.go:130-134)"),
    Setting("queue.origin_metadata_as_destination_column", Some("false"),
      "bool",
      "Ingest origin metadata items — _peerdb_origin_transaction_id, " +
        "_peerdb_origin_checkpoint_id, _peerdb_origin_commit_time_nano " +
        "— into each change record's image, so queue payloads (and " +
        "the Lua record env) carry provenance " +
        "(PEERDB_ORIGIN_METADATA_AS_DESTINATION_COLUMN, " +
        "dynamicconf.go:407; record_items.go:72-76)"),
    Setting("mirror.empty_batch_throttle_seconds", Some("60"), "int",
      "Reply to an UNREQUESTED primary keepalive on the PG " +
        "replication stream at most once per this many seconds, so " +
        "an idle source's slot keeps advancing between demanded " +
        "replies; -1 replies only when the server requests " +
        "(PEERDB_PKM_EMPTY_BATCH_THROTTLE_THRESHOLD_SECONDS, " +
        "dynamicconf.go:365; cdc.go:674-692,816-818)"),
    Setting("clickhouse.initial_load_allow_non_empty_tables",
      Some("false"), "bool",
      "Waive the VALIDATE MIRROR block on an initial snapshot into a " +
        "destination table that already has rows (double-load risk — " +
        "on by explicit choice only); a source_schema_as_destination_" +
        "column mirror waives it automatically (many sources load ONE " +
        "destination) " +
        "(PEERDB_CLICKHOUSE_INITIAL_LOAD_ALLOW_NON_EMPTY_TABLES; " +
        "clickhouse/validate.go:70-87)"),
    Setting("bigquery.synced_at_partitioning", Some("false"), "bool",
      "Create BigQuery target tables PARTITION BY " +
        "DATE(_peerdb_synced_at) — day partitioning by load time for " +
        "retention and pruning on append-heavy destinations " +
        "(PEERDB_BIGQUERY_ENABLE_SYNCED_AT_PARTITIONING_BY_DAYS, " +
        "dynamicconf.go:268; bigquery.go:742-752)"),
    Setting("clickhouse.client_name", Some("peerdb"), "string",
      "Client name the engine reports to ClickHouse — over the HTTP " +
        "interface it rides the User-Agent header (the server's " +
        "http_user_agent) (PEERDB_CLICKHOUSE_CLIENT_NAME, " +
        "dynamicconf.go:325; clickhouse.go:230-236)"),
    Setting("clickhouse.binary_format", Some("raw"), "string",
      "How BYTES columns land on ClickHouse destinations: 'raw' " +
        "(decoded bytes in the String column, the default), 'hex' " +
        "(hex text), 'base64' (base64 text). Applied uniformly on " +
        "every CH write path — normalize, QRep staging copy, " +
        "snapshot copy — so one column never mixes representations; " +
        "unknown values fail loudly " +
        "(PEERDB_CLICKHOUSE_BINARY_FORMAT, dynamicconf.go:549-560, " +
        "768-783; normalize_query.go:263-296)"),
    Setting("clickhouse.max_insert_threads", Some("0"), "uint",
      "ClickHouse max_insert_threads session setting on every " +
        "statement the engine sends (normalize INSERT…SELECTs " +
        "parallelize server-side); 0 leaves the server default " +
        "(PEERDB_CLICKHOUSE_MAX_INSERT_THREADS, dynamicconf.go:293; " +
        "clickhouse.go:222-226)"),
    Setting("clickhouse.enable_primary_update", Some("true"), "bool",
      "Emit deletion records for updates on the ClickHouse normalize " +
        "(the UNION branch tombstoning the OLD key at version-1) so " +
        "a primary-key update kills the stale row " +
        "(PEERDB_CLICKHOUSE_ENABLE_PRIMARY_UPDATE, dynamicconf.go:285" +
        "; normalize_query.go:339-357). The reference defaults FALSE " +
        "(stale-row risk documented there); this engine defaults " +
        "true so the CH destination matches the local normalizer's " +
        "PK-update semantics (q_pk_update_union) — set false for " +
        "byte-parity with a default reference deployment"),
    Setting("clickhouse.parallel_normalize", Some("0"), "uint",
      "Divide a batch's per-table normalize INSERT…SELECTs across N " +
        "concurrent statements — distributes load on a multi-node " +
        "ClickHouse; 0/1 runs them sequentially " +
        "(PEERDB_CLICKHOUSE_PARALLEL_NORMALIZE, dynamicconf.go:301)"),
    Setting("mirror.nullable", Some("false"), "bool",
      "Propagate the source schema's nullability into destination " +
        "DDL — a source-NOT-NULL column creates NOT NULL on the " +
        "destination; off (the reference default) leaves every " +
        "non-key column nullable (PEERDB_NULLABLE, dynamicconf.go:" +
        "130; postgres client.go:713-716)"),
    Setting("pg.automated_schema_dump", Some("false"), "bool",
      "For PG→PG mirrors, stream a schema-only pg_dump from the " +
        "source into psql on the destination during setup so the " +
        "destination's schema/tables/indexes match the source — the " +
        "deployment-wide switch for the per-mirror schema_migration " +
        "'pgdump' option; silently inapplicable to non-PG-to-PG " +
        "mirrors like the reference's peer-type-gated activity " +
        "(PEERDB_PG_AUTOMATED_SCHEMA_DUMP, dynamicconf.go:488)"),
    Setting("mysql.default_partition_key_enabled", Some("true"), "bool",
      "Auto-detect a partition key from the primary key for the " +
        "MySQL initial load (numeric pk → BETWEEN ranges, string pk " +
        "→ sampled/adaptive string partitioner); off clones every " +
        "table as one full scan " +
        "(PEERDB_MYSQL_DEFAULT_PARTITION_KEY_ENABLED, " +
        "dynamicconf.go:472; snapshot_activity.go:185-215)"),
    Setting("mysql.binlog_staleness_seconds", Some("180"), "uint",
      "Maximum mid-stream wait for MySQL binlog bytes before the " +
        "CDC connection is treated as STALE (typed error, classified " +
        "CONNECTION_STALE — a source that heartbeats when idle going " +
        "silent this long means a broken connection, not idleness); " +
        "0 keeps the plain read timeout " +
        "(PEERDB_MYSQL_BINLOG_STALENESS_SECONDS, dynamicconf.go:505; " +
        "mysql/cdc.go:1063-1080)"),
    Setting("mysql.skip_gtid_set", Some(""), "string",
      "GTID set merged into the MySQL CDC resume offset at stream " +
        "start — those transactions are treated as already applied " +
        "and SKIPPED (possible data loss by design: set per mirror " +
        "to recover from purged binlogs, using the missing set " +
        "error 1236 reports) (PEERDB_MYSQL_SKIP_GTID_SET, " +
        "dynamicconf.go:513; merge-at-start mysql/cdc.go:469-481). " +
        "MySQL uuid:range sets and MariaDB domain-server-seq sets " +
        "both merge; a file:pos offset has no GTID mechanism and " +
        "ignores the setting like the reference's filepos leg"),
    Setting("mirror.ctid_partitioning", Some("true"), "bool",
      "Use CTID block partitioning for a QRep pull whose " +
        "watermark_column is 'ctid' (the initial-load flavor): " +
        "partitions are physical block ranges of the watermark " +
        "table, each slice an inclusive '(b,0)'::tid..'(b,65535)' " +
        "range. Off (and no explicit num_partitions) falls back to " +
        "one full-scan partition " +
        "(PEERDB_POSTGRES_APPLY_CTID_BLOCK_PARTITIONING_OVERRIDE, " +
        "dynamicconf.go:464; the partitioner switch " +
        "qrep_source.go:214-233)"),
    Setting("mirror.skip_snapshot_export", Some("false"), "bool",
      "Skip the exported-snapshot hold during the initial load: the " +
        "slot is still created (the CDC consistent point stands) but " +
        "the snapshot-holding session closes immediately and the " +
        "parallel table reads run WITHOUT SET TRANSACTION SNAPSHOT — " +
        "each slice sees current data. Avoids initial loads failing " +
        "when the held session's connection drops, at a consistency " +
        "risk the version-idempotent merge absorbs (rows changed " +
        "between slot creation and the read arrive twice: once in " +
        "the read, once replayed from the slot) " +
        "(PEERDB_SKIP_SNAPSHOT_EXPORT, dynamicconf.go:390; " +
        "postgres_source.go:651-658 closes the exporting conn and " +
        "returns SnapshotName '', setTransactionSnapshot no-ops on " +
        "empty, qrep_source.go:140-141)"),
    Setting("maintenance.skipped_snapshot_wait_flows", Some(""), "string",
      "Comma-joined flow names whose in-flight snapshots the " +
        "maintenance drain skips waiting for — the " +
        "SkipSnapshotWaitFlows signal payload " +
        "(StartMaintenanceSignal.skipped_snapshot_wait_flows, " +
        "flow/cmd/handler.go:886-928); only meaningful while " +
        "maintenance.mode is on"))

  private val byName = all.map(s => s.name -> s).toMap

  /** Env-first, then override, then default resolution — exactly
    * `dynLookup` (dynamicconf.go:558: the flow's env map wins over the
    * catalog row, which wins over the compiled default). `env` is a
    * per-flow override map (FlowConnectionConfigs.env, proto field 24),
    * keyed by the same setting names. Throws on names outside the
    * catalog — a typo'd setting should fail loudly, not silently fall
    * back. */
  def get(spark: SparkSession, name: String,
      env: Map[String, String] = Map.empty): Option[String] = {
    val s = byName.getOrElse(name,
      throw new IllegalArgumentException(s"unknown setting $name"))
    env.get(name)
      .orElse(spark.conf.getOption(s"spark.graft.$name"))
      .orElse(s.default)
  }

  def getLong(spark: SparkSession, name: String,
      env: Map[String, String] = Map.empty): Long =
    get(spark, name, env).map(_.toLong).getOrElse(
      throw new IllegalArgumentException(s"setting $name has no value"))

  /** Validate a per-flow env map at DDL time: every key must name a
    * catalog setting and every value must parse for its type. */
  def validateEnv(env: Map[String, String]): Unit =
    env.foreach { case (k, v) =>
      val s = byName.getOrElse(k,
        throw new IllegalArgumentException(s"env: unknown setting $k"))
      if (s.valueType == "uint" || s.valueType == "int") {
        val n = try v.toLong catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"env: $k must be ${s.valueType}, got '$v'")
        }
        if (s.valueType == "uint" && n < 0)
          throw new IllegalArgumentException(s"env: $k must be >= 0")
      }
    }

  /** An [[Alerting.Alerter]] wired from the deployment settings — the
    * reference's construction path (thresholds and gap read from
    * dynamic config at check time, alerting.go:136/202/297, each taking
    * the flow's env map first). */
  def alerter(spark: SparkSession, senders: Seq[Alerting.Sender],
      clock: () => Long = () => System.currentTimeMillis(),
      env: Map[String, String] = Map.empty)
      : Alerting.Alerter =
    new Alerting.Alerter(senders,
      defaultSlotLagMb = getLong(spark, "alerting.slot_lag_threshold", env),
      defaultOpenConnections =
        getLong(spark, "alerting.open_connections_threshold", env),
      gapMinutes = getLong(spark, "alerting.gap_minutes", env),
      clock = clock)
}
