package graft.mirror

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}

import graft.cdc.{CaptureEndpoint, PgWire}
import graft.server.PgClient

/** Consistent snapshot→CDC handoff against a LIVE PostgreSQL source —
  * the reference's initial-load correctness mechanism
  * (flow/workflows/snapshot_flow.go; slot setup
  * flow/connectors/postgres/client.go:600-666, snapshot import
  * flow/connectors/postgres/qrep_source.go:141):
  *
  *  1. A replication-mode connection (`replication=database` startup)
  *     runs `CREATE_REPLICATION_SLOT … LOGICAL pgoutput` — on a
  *     replication connection this EXPORTS a snapshot and returns the
  *     slot's `consistent_point`. The exported snapshot stays valid
  *     only while this connection sits idle, so the session object
  *     holds it open across the whole snapshot phase (the reference
  *     threads the open `Conn` through SetupReplicationResult for the
  *     same reason).
  *  2. Every table is read AT that snapshot by parallel Spark
  *     partitions: each executor connection runs
  *     `BEGIN ISOLATION LEVEL REPEATABLE READ;
  *      SET TRANSACTION SNAPSHOT '<name>'` and scans one physical
  *     CTID block range (TID range scans, PG ≥ 13 — the reference's
  *     `SupportsTIDScans` partitioning: uniform in bytes by
  *     construction, no watermark column needed, no skew).
  *  3. A write racing the snapshot is exactly-once by construction,
  *     and the guarantee is SERVER-side: committed before the slot
  *     reached consistency → visible to the snapshot and never
  *     streamed (the slot starts at `consistent_point`); committed
  *     after → invisible to the snapshot and streamed. Locally the
  *     engine's WAL stamps its own sequential checkpoint ids (they are
  *     NOT LSNs — [[graft.cdc.PgOutputFrames.ingestFrom]] restamps),
  *     so the snapshot bootstraps at version 0 on a fresh mirror:
  *     every streamed change (checkpoint ≥ 1) beats it in the MERGE.
  *
  * Spark-first shape: the per-partition socket reads are the genuine
  * imperative edge (a wire protocol inside `mapPartitions`); the rows
  * re-enter the declarative plan as JSON → `from_json` with the
  * table's payload schema — the SAME decode path CDC records take, so
  * snapshot and stream cannot diverge on value rendering (both go
  * through [[graft.cdc.PgRows]]'s OID-driven JSON).
  */
object SnapshotFlow {

  /** `CREATE_REPLICATION_SLOT` result row: slot, consistent_point,
    * snapshot_name (pglogrepl.ParseCreateReplicationSlot parity). */
  final case class ExportedSlot(slot: String, consistentPoint: Long,
      snapshotName: String)

  /** "X/Y" hex LSN → the engine's Long checkpoint form. */
  def parseLsn(s: String): Long = s.split("/") match {
    case Array(hi, lo) =>
      (java.lang.Long.parseLong(hi, 16) << 32) |
        java.lang.Long.parseLong(lo, 16)
    case _ => throw new IllegalArgumentException(s"bad LSN '$s'")
  }

  /** Keeps the slot-creating replication connection open — the
    * exported snapshot's lifetime. Close AFTER the snapshot reads. */
  final class SlotSession private[SnapshotFlow] (client: PgClient,
      val exported: ExportedSlot) extends AutoCloseable {
    override def close(): Unit = client.close()
  }

  private def clientFor(ep: CaptureEndpoint,
      startupParams: Seq[(String, String)] = Nil): PgClient =
    graft.server.PgClients.connect(ep, startupParams)

  /** Create the mirror's slot with an exported snapshot. The slot name
    * comes from the capture URL (`pgwire://…?slot=s`), so the CDC
    * stream that follows picks up exactly this slot at its
    * consistent point. `recreate` is RESYNC's posture: an existing
    * slot (42710 duplicate_object) is dropped and re-created, giving
    * the rebuild a FRESH consistent point — the reference's resync
    * drops the slot for the same reason (a retained slot would replay
    * pre-snapshot history over the new snapshot). */
  def createExportedSlot(captureUrl: String,
      recreate: Boolean = false): SlotSession = {
    val ep = CaptureEndpoint.parse(captureUrl)
    require(ep.scheme == "pgwire",
      s"snapshot handoff needs a pgwire:// capture URL, got ${ep.scheme}")
    val slot = ep.param("slot", "graft_slot")
    val c = clientFor(ep, startupParams =
      Seq("replication" -> "database"))
    try {
      // the reference's pre-slot session posture (client.go:606-614):
      // the connection idles in-transaction for the whole snapshot
      // phase, and slot creation must not give up on lock waits
      c.queryAll("SET idle_in_transaction_session_timeout=0")
      c.queryAll("SET lock_timeout=0")
      val createSql = "CREATE_REPLICATION_SLOT " +
        s"${PgWire.quoteIdent(slot)} LOGICAL pgoutput"
      val r =
        try c.query(createSql)
        catch {
          case e: graft.server.PgClient.PgServerError
              if recreate && e.sqlState == "42710" =>
            // WAIT: an active holder (a paused stream mid-disconnect)
            // blocks the drop briefly instead of failing the resync
            c.queryAll("DROP_REPLICATION_SLOT " +
              s"${PgWire.quoteIdent(slot)} WAIT")
            c.query(createSql)
        }
      val row = r.rows.headOption.getOrElse(
        throw new IllegalStateException("no CREATE_REPLICATION_SLOT row"))
      // columns: slot_name, consistent_point, snapshot_name, plugin
      new SlotSession(c, ExportedSlot(
        row(0).getOrElse(slot),
        parseLsn(row(1).getOrElse("0/0")),
        row(2).getOrElse("")))
    } catch { case e: Throwable => c.close(); throw e }
  }

  /** One CTID block slice; `hiBlock` None = open-ended (the LAST slice
    * scans to the physical end, so blocks appended between the size
    * probe and the scan are still covered — their tuples are simply
    * invisible to the snapshot). */
  private final case class Slice(loBlock: Long, hiBlock: Option[Long])

  /** Distributed read of `table` AT the exported snapshot. Column
    * pruning is pushed to the server (only `schema`'s fields travel);
    * partition pruning is physical (CTID block ranges). */
  def readTable(spark: SparkSession, captureUrl: String,
      snapshotName: String, table: String,
      schema: org.apache.spark.sql.types.StructType,
      numPartitions: Int = 4): DataFrame = {
    val ep = CaptureEndpoint.parse(captureUrl)
    val cols = schema.fieldNames.toSeq
    val colSql = cols.map(PgWire.quoteIdent).mkString(", ")
    val tableSql = table.split("\\.", 2) match {
      case Array(ns, n) => s"${PgWire.quoteIdent(ns)}.${PgWire.quoteIdent(n)}"
      case _ => PgWire.quoteIdent(table)
    }

    // size probe: physical blocks now; under-counting is impossible for
    // snapshot-visible tuples (they existed at slot creation), and the
    // open-ended last slice absorbs any growth since the probe
    val nBlocks = {
      val c = clientFor(ep)
      try c.query("SELECT pg_relation_size(" +
        PgWire.quoteLiteral(tableSql) + "::regclass) / " +
        "current_setting('block_size')::bigint")
        .rows.head.head.getOrElse("0").toLong
      finally c.close()
    }
    val slices: Seq[Slice] = {
      val n = math.max(1, math.min(numPartitions,
        math.max(1L, nBlocks).toInt))
      val per = math.max(1L, (nBlocks + n - 1) / n)
      (0 until n).map { i =>
        Slice(i * per, if (i == n - 1) None else Some((i + 1) * per))
      }
    }

    val snap = snapshotName
    val urlSer = captureUrl // plain string into the closure
    val jsonRows = spark.createDataset(
      spark.sparkContext.parallelize(slices, slices.size)
        .mapPartitions { it =>
          it.flatMap { s =>
            val c = graft.server.PgClients.connect(urlSer)
            try {
              c.queryAll("BEGIN ISOLATION LEVEL REPEATABLE READ")
              c.queryAll("SET TRANSACTION SNAPSHOT " +
                PgWire.quoteLiteral(snap))
              val where = s"ctid >= '(${s.loBlock},0)'::tid" +
                s.hiBlock.map(h => s" AND ctid < '($h,0)'::tid")
                  .getOrElse("")
              val r = c.query(
                s"SELECT $colSql FROM $tableSql WHERE $where")
              val oids = c.lastTypeOids
              // materialize before close: Result is already in memory
              r.rows.map(graft.cdc.PgRows.json(r.columns, oids, _))
                .iterator
            } finally c.close()
          }
        })(Encoders.STRING)
    jsonRows.select(from_json(col("value"), schema).as("r"))
      .select(cols.map(n => col(s"r.$n")): _*)
  }

  /** The whole initial-load phase: export the slot, snapshot every
    * routed table at it in parallel partitions, bootstrap the
    * destinations, release the snapshot, and return the runner already
    * bootstrapped — `runAvailableNow()` on it continues seamlessly
    * into CDC. Must run on a FRESH mirror (empty local WAL): the
    * snapshot bootstraps at local version 0 and the slot's
    * `consistent_point` guarantees the stream carries exactly the
    * post-snapshot commits (restamped locally from checkpoint 1 up). */
  def initialLoad(spark: SparkSession, cfg: MirrorConfig,
      numPartitions: Int = 4, recreateSlot: Boolean = false)
      : MirrorRunner = {
    val url = cfg.captureDir.getOrElse(throw new IllegalArgumentException(
      "initialLoad needs captureDir = pgwire://…"))
    require(graft.cdc.ChangeLogWal.headCp(cfg.walDir) < 0,
      "initialLoad needs a fresh mirror: local WAL already has records")
    val session = createExportedSlot(url, recreate = recreateSlot)
    try {
      val cfg2 = cfg.copy(snapshotCheckpoint = 0L)
      val runner = new MirrorRunner(spark, cfg2)
      val tables = (cfg.destinationTable ->
        TableConfig(cfg.pkColumns, cfg.payloadSchema)) +:
        cfg.extraTables.toSeq
      tables.foreach { case (table, tc) =>
        runner.bootstrapSnapshot(table, readTable(spark, url,
          session.exported.snapshotName, table, tc.effectiveSchema,
          numPartitions))
      }
      runner
    } finally session.close()
  }
}
