package graft.model

import org.apache.spark.sql.types._

/** One change event — the Spark restatement of the reference's
  * `Record[Items]` variants (flow/model/record.go:9-175) flattened into a
  * single wide row, which is also exactly the raw staging-table schema every
  * CDC sink materializes (docs/peerdb-architecture.md §5.4;
  * flow/connectors/clickhouse/cdc.go:58-104).
  *
  *   - recordType: 0=insert, 1=update, 2=delete (raw `_peerdb_record_type`).
  *   - checkpointId: source log position (LSN / binlog pos); monotonically
  *     increasing within a stream. With GTID/resume-token sources the textual
  *     checkpoint travels in `checkpointText`.
  *   - data / matchData: the new and old row images as JSON strings (the raw
  *     table keeps payloads semi-structured until normalize, like
  *     `_peerdb_data` / `_peerdb_match_data`).
  *   - unchangedToastColumns: columns whose values are ABSENT from `data`
  *     (TOAST'd, unchanged) — absent ≠ null; normalize must not clobber them
  *     (record.go:77-89, design doc §1.4).
  */
final case class ChangeRecord(
    recordType: Int,
    checkpointId: Long,
    checkpointText: String,
    commitTimeMicros: Long,
    transactionId: Long,
    sourceTable: String,
    destinationTable: String,
    data: String,
    matchData: String,
    unchangedToastColumns: Seq[String])

object ChangeRecord {
  val TypeInsert = 0
  val TypeUpdate = 1
  val TypeDelete = 2
  /** schema-change delta (RelationRecord, record.go:150) — payload in `data`
    * as a JSON TableSchemaDelta. */
  val TypeRelation = 3
  /** logical decoding message (MessageRecord, record.go:175). */
  val TypeMessage = 4
}

/** The raw staging table: central relation of the engine (§2.4 of SURVEY).
  * Normalize reads `_peerdb_batch_id` ranges out of it; the micro-batch id
  * plays the reference's batch-id role. */
object RawTable {
  val Uid = "_peerdb_uid"
  val Timestamp = "_peerdb_timestamp"
  val DestinationTable = "_peerdb_destination_table_name"
  val Data = "_peerdb_data"
  val RecordType = "_peerdb_record_type"
  val MatchData = "_peerdb_match_data"
  val BatchId = "_peerdb_batch_id"
  val UnchangedToastColumns = "_peerdb_unchanged_toast_columns"

  val schema: StructType = StructType(Seq(
    StructField(Uid, StringType, nullable = false),
    StructField(Timestamp, LongType, nullable = false),
    StructField(DestinationTable, StringType, nullable = false),
    StructField(Data, StringType, nullable = true),
    StructField(RecordType, IntegerType, nullable = false),
    StructField(MatchData, StringType, nullable = true),
    StructField(BatchId, LongType, nullable = false),
    StructField(UnchangedToastColumns, StringType, nullable = true)))

  // Normalized tables additionally carry (normalize_query.go:327-332):
  val IsDeleted = "_peerdb_is_deleted"
  val Version = "_peerdb_version"
  val SyncedAt = "_peerdb_synced_at"
}
