package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

import graft.model.RawTable
import graft.types.QKind

/** Destination-side SQL execution — the seam between the engine (which
  * stages files and GENERATES statements) and a warehouse (which RUNS
  * them). Production binds a JDBC connection per destination; tests and
  * offline validation bind [[StubWarehouse]], which replays the same
  * statement text against in-process tables. */
trait SqlExecutor {

  /** Run one statement on the destination. */
  def execute(sql: String): Unit

  /** Bulk-load staged Avro files into `stagingTable` (the COPY INTO /
    * PUT+COPY / S3-engine-read step — the one operation warehouses
    * expose as a native bulk command rather than portable SQL).
    * `schema` is the staged frame's schema (what [[AvroStage]] wrote). */
  def loadAvro(stagingTable: String, files: Seq[String],
      schema: StructType): Unit
}

/** The staging→load→merge loop of a warehouse destination, executable
  * end to end — the counterpart of the reference's per-warehouse sync
  * loops (clickhouse/avro_sync.go:57-423 SyncQRepRecords/pushS3ToCH,
  * snowflake/qrep_avro_consolidate.go stage→temp→MERGE):
  *
  *   1. stage the normalized batch as Avro OCF files ([[AvroStage]]);
  *   2. bulk-load them into the staging table;
  *   3. run the generated normalize statements — ANSI MERGE (Snowflake/
  *      BigQuery/PG≥15 family), the UPSERT+DELETE fallback (PG<15), or
  *      the ClickHouse INSERT SELECT into a ReplacingMergeTree;
  *   4. drop the staging table.
  *
  * The loader owns sequencing and statement generation only; every
  * destination-specific behavior lives behind [[SqlExecutor]], so a
  * socket/JDBC driver drops in without touching this loop.
  */
final class WarehouseLoader(
    target: MergeTarget,
    exec: SqlExecutor,
    dialect: QKind.Dialect = QKind.Dialect.Ansi,
    /** MERGE vs the ON CONFLICT fallback (ignored for ClickHouse, which
      * always INSERT SELECTs). */
    useMerge: Boolean = true) {

  /** Peer-flavor presets, the per-connector loop selections of the
    * reference collapsed onto (dialect, useMerge):
    *   - postgres ≥15 / snowflake / bigquery → MERGE;
    *   - postgres <15 and COCKROACHDB (the PG-family alias,
    *     flow/connectors/cockroachdb/ — same wire protocol, same SQL,
    *     no MERGE) → the ON CONFLICT upsert loop;
    *   - clickhouse → INSERT SELECT into ReplacingMergeTree. */
  def this(target: MergeTarget, exec: SqlExecutor, flavor: String) =
    this(target, exec,
      flavor match {
        case "snowflake" => QKind.Dialect.Snowflake
        case "bigquery" => QKind.Dialect.BigQuery
        case "clickhouse" => QKind.Dialect.ClickHouse
        case _ => QKind.Dialect.Ansi // postgres family incl. cockroachdb
      },
      useMerge = flavor match {
        case "cockroachdb" | "postgres14" => false
        case _ => true
      })

  private def isClickhouse = dialect == QKind.Dialect.ClickHouse

  /** SetupNormalizedTables: create the destination table in-dialect;
    * a PRE-EXISTING table (pg_dump schema migration, user-created)
    * gains the merge meta columns idempotently. */
  def setup(): Unit = {
    exec.execute(MergeSqlGenerator.createTable(target, dialect))
    MergeSqlGenerator.ensureMetaColumns(target, dialect)
      .foreach(exec.execute)
  }

  /** Sync one normalized batch ([[graft.cdc.Normalizer]] output shape:
    * one row per key + version/is_deleted/_absent_cols). Returns the
    * staged file paths. */
  def loadBatch(normalized: DataFrame, stageDir: String,
      /** `avro.codec` of the staged OCFs — "deflate" trades CPU for
        * ~4-8× less stage-dir/object-storage traffic on the wide JSON
        * batches (avro_writer.go:38,80); readers auto-detect from the
        * file header, so the loaders need no flag. */
      stageCodec: String = "null",
      /** PEERDB_S3_BYTES_PER_AVRO_FILE: roll staged files at this
        * pre-compression bound (0 = one per partition). */
      stageBytesPerFile: Long = 0L,
      /** When set, the staging write job adds each staged row — the
        * caller's rows-moved count without a second execution of
        * `normalized`. */
      rowCounter: org.apache.spark.util.LongAccumulator = null,
      /** PEERDB_CLICKHOUSE_BINARY_FORMAT for the CH copy step (staged
        * bytes are base64 text; the INSERT…SELECT decodes per
        * format). Non-CH dialects ignore it. */
      chBinaryFormat: String = "raw")
      : Seq[String] = {
    val staged = MergeSqlGenerator.stageFrame(normalized)
    // combos BEFORE staging: the branch set must describe exactly this
    // batch (a stale set silently skips updates — see merge() scaladoc)
    val combos = MergeSqlGenerator.absentCombosOf(staged)
    val files = AvroStage.write(staged, stageDir, stageCodec,
      rowCounter, maxBytesPerFile = stageBytesPerFile)
    exec.execute(MergeSqlGenerator.createStaging(target, staged.schema,
      dialect))
    exec.loadAvro(target.stagingTable, files, staged.schema)
    if (isClickhouse)
      exec.execute(MergeSqlGenerator.clickhouseInsert(target,
        binaryFormat = chBinaryFormat))
    else if (useMerge)
      exec.execute(MergeSqlGenerator.merge(target, combos, dialect))
    else
      MergeSqlGenerator.upsertFallback(target, combos).foreach(exec.execute)
    exec.execute("DROP TABLE IF EXISTS " +
      MergeSqlGenerator.qualified(target.stagingTable, dialect))
    files
  }
}
