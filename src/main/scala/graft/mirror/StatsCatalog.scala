package graft.mirror

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Durable replication-statistics catalog — the Spark restatement of the
  * reference's `peerdb_stats` schema
  * (flow/connectors/utils/monitoring/monitoring.go): per-flow LSN gauges
  * (`cdc_flows`), per-batch bookkeeping (`cdc_batches`), additive
  * per-table operation counts (`cdc_table_aggregate_counts`), QRep run /
  * partition lifecycle (`qrep_runs`, `qrep_partitions`), slot-size
  * history (`peer_slot_size`) and the schema-change audit log
  * (`schema_deltas_audit_log`).
  *
  * The reference writes these through a Postgres catalog pool; here the
  * store is event-sourced over the Hadoop FileSystem API so the stats
  * live next to the destination tables on HDFS/object storage: every
  * mutation appends a fold event, one immutable segment file per
  * `flush()`, and readers fold segments (oldest→newest) into the current
  * table state. The catalog UPSERT idioms become fold ops:
  *
  *   - `init` — INSERT … ON CONFLICT DO NOTHING (first write wins)
  *   - `set`  — column-wise UPDATE of one keyed row (no-op if absent)
  *   - `add`  — additive UPDATE (counts; `latest_batch_id` takes
  *              GREATEST, matching the aggregate-counts conflict clause,
  *              monitoring.go:212-243), creating the row if absent
  *   - `ins`  — append-only row (history/audit tables)
  *   - `endb` — the one predicate UPDATE in the schema: close every
  *              open batch of a flow up to an id (monitoring.go:105-119)
  *   - `del`  — DeleteMirrorStats (monitoring.go:478-507)
  *
  * Stats rows are per-batch / per-partition, never per-record, so the
  * folded state is driver-sized by construction (the reference keeps the
  * same rows in a single-node Postgres). `compact()` bounds the fold
  * cost for long-lived mirrors: it snapshots the folded state into a
  * `.snap` segment — readers start at the newest snapshot, so the
  * pre-snapshot segments become garbage, deletable at leisure
  * (crash-safe in both orders: re-folding old segments under a snapshot
  * is ignored for keyed rows and skipped for history rows).
  *
  * Single-writer per catalog directory, like the rest of the durable
  * state (one flow owns its stats, matching the per-flow catalog rows).
  */
final class StatsCatalog(dir: String,
    conf: Configuration = new Configuration(),
    nowMs: () => Long = () => System.currentTimeMillis()) {

  import StatsCatalog._

  private val eventsDir = new Path(dir, "events")
  private def fs: FileSystem = eventsDir.getFileSystem(conf)

  private val buf = mutable.ArrayBuffer.empty[Event]
  private var nextSeq: Long = {
    val existing = listSegments()
    if (existing.isEmpty) 0L else existing.map(segSeq).max + 1
  }

  // ------------------------------------------------------------ mutators
  // Each mirrors one monitoring.go function (cited); all buffer until
  // flush() so one micro-batch lands as one segment file.

  /** InitializeCDCFlow (monitoring.go:33-41). */
  def initializeCdcFlow(flow: String): Unit = append(Event(
    "cdc_flows", "init", Seq(flow),
    Map("flow_name" -> flow, "latest_lsn_at_source" -> 0L,
      "latest_lsn_at_target" -> 0L)))

  /** UpdateLatestLSNAtSourceForCDCFlow (monitoring.go:43-53). */
  def updateLatestLsnAtSource(flow: String, lsn: Long): Unit = append(
    Event("cdc_flows", "set", Seq(flow),
      Map("latest_lsn_at_source" -> lsn)))

  /** UpdateLatestLSNAtTargetForCDCFlow (monitoring.go:55-66). */
  def updateLatestLsnAtTarget(flow: String, lsn: Long): Unit = append(
    Event("cdc_flows", "set", Seq(flow),
      Map("latest_lsn_at_target" -> lsn)))

  /** AddCDCBatchForFlow (monitoring.go:68-81). */
  def addCdcBatch(flow: String, batchId: Long): Unit = append(Event(
    "cdc_batches", "init", Seq(flow, batchId),
    Map("flow_name" -> flow, "batch_id" -> batchId,
      "rows_in_batch" -> 0L, "batch_start_lsn" -> 0L,
      "batch_end_lsn" -> 0L, "start_time" -> nowMs())))

  /** UpdateNumRowsAndEndLSNForCDCBatch (monitoring.go:83-103);
    * `sync_time=NOW()` marks the batch staged-but-not-yet-normalized —
    * the normalize-lag probe keys on it. */
  def updateCdcBatch(flow: String, batchId: Long, rows: Long,
      endLsn: Long, endLsnText: String = "",
      firstRowCommitMicros: Option[Long] = None): Unit = append(Event(
    "cdc_batches", "set", Seq(flow, batchId),
    Map("rows_in_batch" -> rows, "batch_end_lsn" -> endLsn,
      "batch_end_lsn_text" -> endLsnText, "sync_time" -> nowMs()) ++
      firstRowCommitMicros.map("first_row_commit_time" -> _)))

  /** UpdateEndTimeForCDCBatch (monitoring.go:105-119): closes every
    * still-open batch with id ≤ `batchId`. */
  def endCdcBatches(flow: String, batchId: Long): Unit =
    append(Event("cdc_batches", "endb", Seq(flow, batchId),
      Map("end_time" -> nowMs())))

  /** AddCDCBatchTablesForFlow (monitoring.go:170-243): additive
    * per-destination-table operation counts. */
  def addBatchTables(flow: String, batchId: Long,
      counts: Seq[TableOps]): Unit = counts.foreach { c =>
    append(Event("cdc_table_aggregate_counts", "add",
      Seq(flow, c.table),
      Map("flow_name" -> flow, "destination_table_name" -> c.table,
        "inserts_count" -> c.inserts, "updates_count" -> c.updates,
        "deletes_count" -> c.deletes,
        "total_count" -> (c.inserts + c.updates + c.deletes),
        "latest_batch_id" -> batchId, "last_updated_at" -> nowMs())))
  }

  /** InitializeQRepRun (monitoring.go:272-303). */
  def initQRepRun(flow: String, runId: String, sourceTable: String,
      destinationTable: String, parentMirror: String): Unit = append(
    Event("qrep_runs", "init", Seq(flow, runId),
      Map("flow_name" -> flow, "run_uuid" -> runId,
        "source_table" -> sourceTable,
        "destination_table" -> destinationTable,
        "parent_mirror_name" -> parentMirror)))

  /** UpdateStartTimeForQRepRun (monitoring.go:305-314). */
  def startQRepRun(flow: String, runId: String): Unit = append(Event(
    "qrep_runs", "set", Seq(flow, runId),
    Map("start_time" -> nowMs(), "fetch_complete" -> true)))

  /** UpdateEndTimeForQRepRun (monitoring.go:316-325). */
  def endQRepRun(flow: String, runId: String): Unit = append(Event(
    "qrep_runs", "set", Seq(flow, runId),
    Map("end_time" -> nowMs(), "consolidate_complete" -> true)))

  /** addPartitionToQRepRun (monitoring.go:358-448): re-adding an
    * existing partition bumps `restart_count` (the ON CONFLICT clause) —
    * restated as init-then-add so both orders fold identically. */
  def addQRepPartition(flow: String, runId: String, partitionId: String,
      rangeStart: Option[String], rangeEnd: Option[String],
      parentMirror: String): Unit = {
    append(Event("qrep_partitions", "init", Seq(runId, partitionId),
      Map("flow_name" -> flow, "run_uuid" -> runId,
        "partition_uuid" -> partitionId,
        "partition_start" -> rangeStart.orNull,
        "partition_end" -> rangeEnd.orNull, "restart_count" -> -1L,
        "parent_mirror_name" -> parentMirror)))
    append(Event("qrep_partitions", "add", Seq(runId, partitionId),
      Map("restart_count" -> 1L)))
  }

  /** UpdateStartTimeForPartition (monitoring.go:450-464). */
  def startQRepPartition(runId: String, partitionId: String): Unit =
    append(Event("qrep_partitions", "set", Seq(runId, partitionId),
      Map("start_time" -> nowMs())))

  /** UpdatePullEndTimeAndRowsForPartition (monitoring.go:466-476). */
  def pullEndQRepPartition(runId: String, partitionId: String,
      rows: Long): Unit =
    append(Event("qrep_partitions", "set", Seq(runId, partitionId),
      Map("pull_end_time" -> nowMs(), "rows_in_partition" -> rows)))

  /** UpdateRowsSyncedForPartition (monitoring.go:489-499). */
  def rowsSyncedQRepPartition(runId: String, partitionId: String,
      rows: Long): Unit =
    append(Event("qrep_partitions", "set", Seq(runId, partitionId),
      Map("rows_synced" -> rows)))

  /** UpdateEndTimeForPartition (monitoring.go:478-487). */
  def endQRepPartition(runId: String, partitionId: String): Unit =
    append(Event("qrep_partitions", "set", Seq(runId, partitionId),
      Map("end_time" -> nowMs())))

  /** AppendSlotSizeInfo (monitoring.go:327-350); gauge unit here is
    * RECORDS (the WAL simulator's native unit, vs the reference's MB). */
  def appendSlotSize(peerName: String, slotName: String,
      confirmedFlushLsn: Long, slotSize: Long,
      walStatus: String = "reserved"): Unit = append(Event(
    "peer_slot_size", "ins", Nil,
    Map("peer_name" -> peerName, "slot_name" -> slotName,
      "confirmed_flush_lsn" -> confirmedFlushLsn,
      "slot_size" -> slotSize, "wal_status" -> walStatus,
      "updated_at" -> nowMs())))

  /** AuditSchemaDelta (monitoring.go:509-525). */
  def auditSchemaDelta(flow: String, batchId: Long,
      deltaJson: String): Unit = append(Event(
    "schema_deltas_audit_log", "ins", Nil,
    Map("flow_job_name" -> flow, "batch_id" -> batchId,
      "delta_info" -> deltaJson, "created_at" -> nowMs())))

  /** InsertFlowLog (alerting.go:414-433) into the `flow_errors` table
    * (V17__mirror_errors.sql — "historically only stored errors, hence
    * the name"): error/warn/info rows per flow, ack'd later by ops. */
  def logFlowEvent(flow: String, message: String,
      errorType: String): Unit = {
    append(Event("flow_errors", "ins", Nil,
      Map("flow_name" -> flow, "error_message" -> message,
        "error_type" -> errorType, "error_timestamp" -> nowMs(),
        "ack" -> false)))
    // Errors must survive the crash that caused them — land immediately
    // rather than waiting for a batch-end flush that may never come.
    flush()
  }
  def logFlowError(flow: String, message: String): Unit =
    logFlowEvent(flow, message, "error")
  def logFlowWarning(flow: String, message: String): Unit =
    logFlowEvent(flow, message, "warn")
  def logFlowInfo(flow: String, message: String): Unit =
    logFlowEvent(flow, message, "info")

  /** DeleteMirrorStats (monitoring.go:478-507): drops the flow's rows
    * from every table (qrep tables match on parent_mirror_name too,
    * like the reference's DELETE set). */
  def deleteMirrorStats(flow: String): Unit = {
    append(Event("*", "del", Seq(flow), Map.empty))
    flush()
  }

  def flush(): Unit = synchronized {
    if (buf.isEmpty) return
    val body = buf.map(Event.toJson).mkString("", "\n", "\n")
    graft.util.FsText.write(
      new Path(eventsDir, f"$nextSeq%08d.jsonl").toString, body, conf)
    nextSeq += 1
    buf.clear()
  }

  // ------------------------------------------------------------- readers

  /** Current state of one stats table as a DataFrame (schemas below —
    * epoch-millis LONG timestamps, engine-portable). */
  def table(spark: SparkSession, name: String): DataFrame = {
    val schema = schemas.getOrElse(name,
      throw new IllegalArgumentException(s"unknown stats table $name"))
    val rows = fold().rows(name).map { m =>
      Row.fromSeq(schema.fields.toIndexedSeq.map(f =>
        m.get(f.name).map(coerce(_, f.dataType)).orNull))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Temp views `stats_<table>` for ad-hoc SQL over the catalog (the
    * peerdb_stats introspection surface). */
  def registerViews(spark: SparkSession): Unit =
    schemas.keys.foreach(t =>
      table(spark, t).createOrReplaceTempView(s"stats_$t"))

  /** GetPendingNormalizeLagByFlow (monitoring.go:143-168): microseconds
    * since the oldest staged-but-unnormalized batch, per flow. */
  def normalizeLagMicros(): Map[String, Long] = {
    val now = nowMs()
    fold().rows("cdc_batches")
      .filter(m => m.contains("sync_time") && !m.contains("end_time"))
      .groupBy(_("flow_name").asInstanceOf[String])
      .map { case (flow, ms) =>
        flow -> (now - ms.map(_("sync_time").asInstanceOf[Long]).min) *
          1000L
      }
  }

  /** Milliseconds since the last COMPLETED normalize per flow — the
    * interval `AlertIfTooLongSinceLastNormalize` checks
    * (alerting.go:243-279; the reference computes it off the last
    * normalized batch). Flows with no completed batch are absent —
    * a mirror that has never normalized is an initial-load concern,
    * not a staleness one. */
  def msSinceLastNormalize(): Map[String, Long] = {
    val now = nowMs()
    fold().rows("cdc_batches")
      .filter(_.contains("end_time"))
      .groupBy(_("flow_name").asInstanceOf[String])
      .map { case (flow, ms) =>
        flow -> (now - ms.map(_("end_time").asInstanceOf[Long]).max)
      }
  }

  /** Snapshot the folded state into a `.snap` segment and delete the
    * now-redundant older segments (fold-cost bound for long-lived
    * flows). Readers prefer the newest snapshot, so a crash between the
    * two steps leaves a correct (merely uncompacted) catalog. */
  def compact(): Unit = synchronized {
    flush()
    val st = fold()
    val before = listSegments()
    if (before.isEmpty) return
    val events =
      st.keyed.map { case ((tbl, _), m) => Event(tbl, "init", keyOf(tbl,
        m), m.toMap) } ++
        st.history.map { case (tbl, m) => Event(tbl, "ins", Nil, m) }
    val body = events.map(Event.toJson).mkString("", "\n", "\n")
    graft.util.FsText.write(
      new Path(eventsDir, f"$nextSeq%08d.snap.jsonl").toString, body,
      conf)
    nextSeq += 1
    before.foreach(p => fs.delete(p, false))
  }

  // -------------------------------------------------------------- fold

  private def listSegments(): Seq[Path] = {
    if (!fs.exists(eventsDir)) return Nil
    fs.listStatus(eventsDir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".jsonl")).sortBy(_.getName)
  }

  private def segSeq(p: Path): Long =
    p.getName.takeWhile(_.isDigit).toLong

  private def fold(): State = synchronized {
    flush()
    val segs = listSegments()
    // Newest snapshot replaces everything before it.
    val fromSnap = segs.lastIndexWhere(_.getName.contains(".snap"))
    val replay = if (fromSnap < 0) segs else segs.drop(fromSnap)
    val st = new State
    for (seg <- replay;
        line <- graft.util.FsText.read(seg.toString, conf)
          .getOrElse("").split('\n') if line.nonEmpty)
      st.apply(Event.fromJson(line))
    st
  }

  private def append(e: Event): Unit = synchronized { buf += e }
}

object StatsCatalog {

  /** Per-table operation counts for one batch (model.RecordTypeCounts). */
  final case class TableOps(table: String, inserts: Long, updates: Long,
      deletes: Long)

  private[mirror] final case class Event(tbl: String, op: String,
      key: Seq[Any], v: Map[String, Any])

  private object Event {
    private val mapper = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      m.registerModule(
        com.fasterxml.jackson.module.scala.DefaultScalaModule)
      m
    }

    def toJson(e: Event): String = {
      val o = new java.util.LinkedHashMap[String, Any]()
      o.put("tbl", e.tbl)
      o.put("op", e.op)
      o.put("key", e.key.map(_.asInstanceOf[AnyRef]).toArray)
      val vv = new java.util.LinkedHashMap[String, Any]()
      e.v.foreach { case (k, x) => vv.put(k, x) }
      o.put("v", vv)
      mapper.writeValueAsString(o)
    }

    def fromJson(s: String): Event = {
      val n = mapper.readTree(s)
      import scala.jdk.CollectionConverters._
      def un(x: com.fasterxml.jackson.databind.JsonNode): Any =
        if (x.isNull) null
        else if (x.isIntegralNumber) x.asLong()
        else if (x.isBoolean) x.asBoolean()
        else x.asText()
      Event(n.get("tbl").asText(), n.get("op").asText(),
        n.get("key").elements().asScala.map(un).toSeq,
        n.get("v").properties().asScala
          .map(e => e.getKey -> un(e.getValue)).toMap)
    }
  }

  /** Folded catalog state: keyed rows per table + append-only history. */
  private final class State {
    val keyed = mutable.LinkedHashMap
      .empty[(String, Seq[Any]), mutable.LinkedHashMap[String, Any]]
    val history = mutable.ArrayBuffer.empty[(String, Map[String, Any])]

    def apply(e: Event): Unit = e.op match {
      case "init" =>
        if (!keyed.contains((e.tbl, e.key)))
          keyed((e.tbl, e.key)) = mutable.LinkedHashMap(e.v.toSeq: _*)
      case "set" =>
        keyed.get((e.tbl, e.key)).foreach(row => e.v.foreach {
          case (k, x) => row(k) = x
        })
      case "add" =>
        val row = keyed.getOrElseUpdate((e.tbl, e.key),
          mutable.LinkedHashMap.empty)
        e.v.foreach {
          case (k, x: Long) if k == "latest_batch_id" =>
            row(k) = math.max(x,
              row.get(k).collect { case l: Long => l }.getOrElse(x))
          case (k, x: Long) =>
            row(k) = x + row.get(k).collect { case l: Long => l }
              .getOrElse(0L)
          case (k, x) => row(k) = x
        }
      case "ins" => history += e.tbl -> e.v
      case "endb" =>
        val Seq(flow, upTo: Long) = e.key: @unchecked
        keyed.iterator.foreach { case ((t, k), row) =>
          if (t == "cdc_batches" && k.headOption.contains(flow) &&
              k(1).asInstanceOf[Long] <= upTo &&
              !row.contains("end_time"))
            row ++= e.v
        }
      case "del" =>
        val flow = e.key.head
        val flowCols = Seq("flow_name", "parent_mirror_name",
          "flow_job_name")
        def owns(m: collection.Map[String, Any]): Boolean =
          flowCols.exists(c => m.get(c).contains(flow))
        keyed.filterInPlace((_, row) => !owns(row))
        history.filterInPlace { case (_, m) => !owns(m) }
      case other =>
        throw new IllegalArgumentException(s"unknown stats op $other")
    }

    def rows(table: String): Seq[Map[String, Any]] =
      (keyed.iterator.collect { case ((t, _), row) if t == table =>
        row.toMap
      } ++ history.iterator.collect { case (t, m) if t == table => m })
        .toSeq
  }

  private def keyOf(tbl: String, m: collection.Map[String, Any])
      : Seq[Any] = tbl match {
    case "cdc_flows" => Seq(m("flow_name"))
    case "cdc_batches" => Seq(m("flow_name"), m("batch_id"))
    case "cdc_table_aggregate_counts" =>
      Seq(m("flow_name"), m("destination_table_name"))
    case "qrep_runs" => Seq(m("flow_name"), m("run_uuid"))
    case "qrep_partitions" => Seq(m("run_uuid"), m("partition_uuid"))
    case other =>
      throw new IllegalArgumentException(s"unkeyed stats table $other")
  }

  private def coerce(x: Any, dt: DataType): Any = (x, dt) match {
    case (null, _) => null
    case (l: Long, LongType) => l
    case (l: Long, StringType) => l.toString
    case (b: Boolean, BooleanType) => b
    case (s: String, StringType) => s
    case (s: String, LongType) => s.toLong
    case (other, _) => other.toString
  }

  /** Table schemas (the peerdb_stats DDL, epoch-millis timestamps). */
  val schemas: Map[String, StructType] = Map(
    "cdc_flows" -> StructType(Seq(
      StructField("flow_name", StringType),
      StructField("latest_lsn_at_source", LongType),
      StructField("latest_lsn_at_target", LongType))),
    "cdc_batches" -> StructType(Seq(
      StructField("flow_name", StringType),
      StructField("batch_id", LongType),
      StructField("rows_in_batch", LongType),
      StructField("batch_start_lsn", LongType),
      StructField("batch_end_lsn", LongType),
      StructField("batch_end_lsn_text", StringType),
      StructField("start_time", LongType),
      StructField("sync_time", LongType),
      StructField("end_time", LongType),
      StructField("first_row_commit_time", LongType))),
    "cdc_table_aggregate_counts" -> StructType(Seq(
      StructField("flow_name", StringType),
      StructField("destination_table_name", StringType),
      StructField("inserts_count", LongType),
      StructField("updates_count", LongType),
      StructField("deletes_count", LongType),
      StructField("total_count", LongType),
      StructField("latest_batch_id", LongType),
      StructField("last_updated_at", LongType))),
    "qrep_runs" -> StructType(Seq(
      StructField("flow_name", StringType),
      StructField("run_uuid", StringType),
      StructField("source_table", StringType),
      StructField("destination_table", StringType),
      StructField("parent_mirror_name", StringType),
      StructField("start_time", LongType),
      StructField("end_time", LongType),
      StructField("fetch_complete", BooleanType),
      StructField("consolidate_complete", BooleanType))),
    "qrep_partitions" -> StructType(Seq(
      StructField("flow_name", StringType),
      StructField("run_uuid", StringType),
      StructField("partition_uuid", StringType),
      StructField("partition_start", StringType),
      StructField("partition_end", StringType),
      StructField("restart_count", LongType),
      StructField("rows_in_partition", LongType),
      StructField("rows_synced", LongType),
      StructField("start_time", LongType),
      StructField("pull_end_time", LongType),
      StructField("end_time", LongType),
      StructField("parent_mirror_name", StringType))),
    "peer_slot_size" -> StructType(Seq(
      StructField("peer_name", StringType),
      StructField("slot_name", StringType),
      StructField("confirmed_flush_lsn", LongType),
      StructField("slot_size", LongType),
      StructField("wal_status", StringType),
      StructField("updated_at", LongType))),
    "schema_deltas_audit_log" -> StructType(Seq(
      StructField("flow_job_name", StringType),
      StructField("batch_id", LongType),
      StructField("delta_info", StringType),
      StructField("created_at", LongType))),
    "flow_errors" -> StructType(Seq(
      StructField("flow_name", StringType),
      StructField("error_message", StringType),
      StructField("error_type", StringType),
      StructField("error_timestamp", LongType),
      StructField("ack", BooleanType))))

  // ------------------------------------------------- shared aggregates
  // The distributed halves of the stats writes — also the bodies of the
  // q_stats_* oracle queries, so the exact aggregation the runner
  // collects from is what the DuckDB oracle checks.

  /** Per-destination-table operation counts for one raw batch — the
    * aggregate behind AddCDCBatchTablesForFlow (monitoring.go:170-243;
    * insert/update/delete = record types 0/1/2, relation/message
    * records excluded). One map-side-combined hash aggregate; keys are
    * table names, so the shuffle is as wide as the table set. */
  def tableCountsFrame(frame: DataFrame, tableCol: String,
      rtypeCol: String): DataFrame = {
    val t = col(tableCol)
    val r = col(rtypeCol)
    frame.filter(r <= graft.model.ChangeRecord.TypeDelete)
      .groupBy(t.as("destination_table_name"))
      .agg(
        sum(when(r === graft.model.ChangeRecord.TypeInsert, 1L)
          .otherwise(0L)).as("inserts_count"),
        sum(when(r === graft.model.ChangeRecord.TypeUpdate, 1L)
          .otherwise(0L)).as("updates_count"),
        sum(when(r === graft.model.ChangeRecord.TypeDelete, 1L)
          .otherwise(0L)).as("deletes_count"),
        count(lit(1)).as("total_count"))
  }

  /** Per-batch row count + end LSN — the aggregate behind
    * UpdateNumRowsAndEndLSNForCDCBatch (monitoring.go:83-103), usable
    * over a whole changefeed for batch-history backfill/audit. */
  def batchInfoFrame(frame: DataFrame, batchCol: String,
      lsnCol: String, commitTimeCol: String): DataFrame =
    frame.groupBy(col(batchCol).as("batch_id"))
      .agg(
        count(lit(1)).as("rows_in_batch"),
        max(col(lsnCol)).as("batch_end_lsn"),
        min(col(commitTimeCol)).as("first_row_commit_time"))
}
