package graft.mirror

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** destination table → SOURCE relation, from a mirror's
    * `tableRoutes` (which maps source → destination): the snapshot
    * must read the SOURCE side of each route — a renaming map would
    * otherwise snapshot a missing, or a wrong same-named, relation.
    * Fan-in (two sources routing to one destination) has no
    * single-relation snapshot; rejected. Shared by all three live
    * snapshot flows (PG / MySQL / Mongo). */
  private[mirror] def invertRoutes(cfg: MirrorConfig)
      : Map[String, String] = {
    val inv = cfg.tableRoutes.groupBy(_._2)
      .map { case (dst, m) => dst -> m.keys.toSeq }
    inv.collect { case (dst, srcs) if srcs.sizeIs > 1 =>
      throw new IllegalArgumentException("initialLoad: table_map " +
        s"fans ${srcs.mkString(", ")} into '$dst' — a fan-in " +
        "destination cannot be snapshot from one source relation")
    }
    inv.map { case (dst, srcs) => dst -> srcs.head }
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
      recreate: Boolean = false,
      /** Crash auto-recovery (the caller vouches the mirror is fresh:
        * no durable snapshot marker, empty local WAL): an EXISTING
        * slot then means a previous attempt died between slot creation
        * and the marker write — re-EXECUTE used to hit 42710 forever
        * and demand a manual RESYNC. An INACTIVE same-named slot is
        * dropped and re-created (fresh consistent point); an ACTIVE
        * one belongs to a live consumer and still refuses. */
      recoverInactive: Boolean = false): SlotSession = {
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
              if (recreate || recoverInactive) &&
                e.sqlState == "42710" =>
            if (!recreate) {
              // auto-recovery only reclaims an INACTIVE slot (a
              // crashed attempt's leftover has no consumer); an
              // active one is someone's live stream — never drop it
              val active = c.query(
                "SELECT active FROM pg_replication_slots " +
                  s"WHERE slot_name = ${PgWire.quoteLiteral(slot)}")
                .rows.headOption.flatMap(_.head).getOrElse("f")
              require(active == "f" || active == "false",
                s"slot '$slot' exists and is ACTIVE — a running " +
                  "consumer owns it; refusing auto-recovery " +
                  "(RESYNC to force)")
            }
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

  /** One probed leaf relation: quoted name + physical stats. */
  private final case class Leaf(sql: String, blocks: Long,
      bytes: Long, rows: Long)

  /** Greedy block packing of leaves into slices of ~`perSlice` blocks
    * (pure): walk leaves in order, filling each slice before starting
    * the next — one slice may span relations, one relation may split
    * across slices (the reference's ChildTableRanges packing,
    * flow/connectors/postgres/qrep_partition.go:229-295). Each element
    * is (quotedTable, loBlock, hiBlock): hiBlock None = open-ended —
    * the range reaching a relation's probed end scans to the physical
    * end, so blocks appended between the size probe and the scan stay
    * covered (their tuples are simply invisible to the snapshot). */
  private[graft] def packSlices(leaves: Seq[(String, Long)],
      perSlice: Long): Seq[Seq[(String, Long, Option[Long])]] = {
    val out = Seq.newBuilder[Seq[(String, Long, Option[Long])]]
    val cur = Seq.newBuilder[(String, Long, Option[Long])]
    var curSize = 0L
    leaves.foreach { case (t, blocks) =>
      var off = 0L
      while (off < blocks) {
        val take = math.min(perSlice - curSize, blocks - off)
        val hi = if (off + take >= blocks) None else Some(off + take)
        cur += ((t, off, hi))
        off += take
        curSize += take
        if (curSize >= perSlice) {
          out += cur.result(); cur.clear(); curSize = 0L
        }
      }
    }
    val tail = cur.result()
    if (tail.nonEmpty) out += tail
    out.result()
  }

  /** Bytes one CTID slice targets when neither an explicit partition
    * count nor a rows-per-partition knob is given: a slice must fit
    * comfortably in executor memory and finish in minutes at wire
    * speed. 256 MiB of heap table per task holds both at 100s-of-GB
    * relations (a 500 GB table → ~2000 slices). */
  val DefaultBytesPerSlice: Long = 256L << 20

  /** Slice-count policy for a live snapshot read (pure, unit-tested):
    * an explicit partition count wins; else `rowsPerPartition` over
    * the planner's `reltuples` estimate (the reference's
    * `snapshot_num_rows_per_partition`, default 250k in its UI); else
    * relation bytes ÷ [[DefaultBytesPerSlice]]. A never-ANALYZEd
    * table (reltuples = -1 → estRows 0) falls back to the byte
    * policy. Clamped to [1, 4096] and to the block count (a slice
    * spans ≥ 1 physical block). */
  private[graft] def sliceCount(nBlocks: Long, bytes: Long,
      estRows: Long, numPartitions: Int,
      rowsPerPartition: Option[Long],
      bytesPerSlice: Long = DefaultBytesPerSlice): Int = {
    val want: Long =
      if (numPartitions > 0) numPartitions.toLong
      else rowsPerPartition match {
        case Some(rpp) if estRows > 0 && rpp > 0 =>
          (estRows + rpp - 1) / rpp
        case _ =>
          (bytes + bytesPerSlice - 1) / math.max(1L, bytesPerSlice)
      }
    math.max(1L, math.min(math.min(want, 4096L),
      math.max(1L, nBlocks))).toInt
  }

  /** Distributed read of `table` AT the exported snapshot. Column
    * pruning is pushed to the server (only `schema`'s fields travel);
    * partition pruning is physical (CTID block ranges). Rows stream
    * off each slice's socket one at a time ([[PgClient.queryCursor]],
    * the reference's QRecordStream posture,
    * flow/connectors/postgres/qrep_query_executor.go:282-520) — per-
    * task memory is O(row), never O(slice). `numPartitions` ≤ 0 means
    * auto-size from the relation's physical size / row estimate
    * ([[sliceCount]]). */
  def readTable(spark: SparkSession, captureUrl: String,
      snapshotName: String, table: String,
      schema: org.apache.spark.sql.types.StructType,
      numPartitions: Int = 0,
      rowsPerPartition: Option[Long] = None): DataFrame = {
    val ep = CaptureEndpoint.parse(captureUrl)
    val cols = schema.fieldNames.toSeq
    val colSql = cols.map(PgWire.quoteIdent).mkString(", ")
    val tableSql = quotedTable(table)
    val slices = tableSlices(ep, tableSql, numPartitions,
      rowsPerPartition)

    val colSqlSer = colSql
    // An EMPTY snapshot name = the skip-snapshot-export posture: each
    // slice reads current data in its own repeatable-read tx (the
    // reference's setTransactionSnapshot no-ops on "", sink_pg.go:62)
    graft.qrep.StreamedPgRead.frame(spark, captureUrl, slices,
      setup = Seq("BEGIN ISOLATION LEVEL REPEATABLE READ") ++
        (if (snapshotName.isEmpty) Nil
         else Seq("SET TRANSACTION SNAPSHOT " +
           PgWire.quoteLiteral(snapshotName))),
      sqlOf = sliceSql(colSqlSer),
      schema = schema)
  }

  /** schema(.table) → its quoted SQL image. */
  private[graft] def quotedTable(table: String): String =
    table.split("\\.", 2) match {
      case Array(ns, n) => s"${PgWire.quoteIdent(ns)}.${PgWire.quoteIdent(n)}"
      case _ => PgWire.quoteIdent(table)
    }

  /** One slice group → its UNION ALL of CTID block-range scans. */
  private[graft] def sliceSql(colSql: String)
      : Seq[(String, Long, Option[Long])] => String =
    (s: Seq[(String, Long, Option[Long])]) =>
      s.map { case (t, lo, hi) =>
        // ONLY: an inheritance parent's own range must not re-read
        // its children (each child has its own ranges)
        s"SELECT $colSql FROM ONLY $t WHERE " +
          s"ctid >= '($lo,0)'::tid" +
          hi.map(h => s" AND ctid < '($h,0)'::tid").getOrElse("")
      }.mkString(" UNION ALL ")

  /** The CTID block-range work items for a distributed read of
    * `tableSql` — the leaf probe + slice packing shared by the
    * exported-snapshot read above and the interactive live-peer scan
    * ([[LivePeerScan]]). Each inner Seq is one task's
    * (leafSql, loBlock, hiBlock) ranges. */
  private[graft] def tableSlices(ep: CaptureEndpoint, tableSql: String,
      numPartitions: Int, rowsPerPartition: Option[Long])
      : Seq[Seq[(String, Long, Option[Long])]] = {
    val c = clientFor(ep)
    try tableSlicesOn(c, tableSql, numPartitions, rowsPerPartition)
    finally c.close()
  }

  /** [[tableSlices]] on a caller-supplied open connection — the
    * interactive router probes schema + slices over ONE session
    * instead of paying two connection setups per routed relation. */
  private[graft] def tableSlicesOn(c: PgClient, tableSql: String,
      numPartitions: Int, rowsPerPartition: Option[Long])
      : Seq[Seq[(String, Long, Option[Long])]] = {
    // size probe: classification first — a declaratively partitioned
    // parent has NO physical blocks of its own (pg_relation_size = 0,
    // which used to degrade a TB-scale partitioned table to ONE
    // full-scan slice), and an inheritance parent's children would be
    // double-read without ONLY. Leaf relations enumerate recursively
    // (multi-level partitioning) with their own block stats; plain
    // tables stay a single self-leaf. Under-counting is impossible
    // for snapshot-visible tuples (they existed at slot creation),
    // and each leaf's final range is open-ended so growth since the
    // probe is still covered.
    val leaves: Seq[Leaf] = {
      {
        val lit = PgWire.quoteLiteral(tableSql)
        val cls = c.query(
          "SELECT c.relkind::text, c.relhassubclass::text " +
            s"FROM pg_class c WHERE c.oid = $lit::regclass").rows
          .headOption.getOrElse(throw new IllegalArgumentException(
            s"snapshot: relation $tableSql not found"))
        val relkind = cls(0).getOrElse("r")
        val hasSub = cls(1).exists(v => v == "t" || v == "true")
        def selfLeaf(): Leaf = {
          val r = c.query(
            s"SELECT pg_relation_size($lit::regclass) / " +
              "current_setting('block_size')::bigint, " +
              s"pg_relation_size($lit::regclass), " +
              "(SELECT greatest(reltuples::bigint, 0) FROM pg_class " +
              s"WHERE oid = $lit::regclass)").rows.head
          Leaf(tableSql, r(0).getOrElse("0").toLong,
            r(1).getOrElse("0").toLong, r(2).getOrElse("0").toLong)
        }
        if (relkind != "p" && !hasSub) Seq(selfLeaf())
        else {
          val kids = c.query(
            "WITH RECURSIVE _graft_kids AS (" +
              "SELECT inhrelid AS oid FROM pg_inherits " +
              s"WHERE inhparent = $lit::regclass " +
              "UNION ALL SELECT i.inhrelid FROM pg_inherits i " +
              "JOIN _graft_kids k ON i.inhparent = k.oid) " +
              "SELECT quote_ident(n.nspname) || '.' || " +
              "quote_ident(c.relname), c.relkind::text, " +
              "pg_relation_size(c.oid) / " +
              "current_setting('block_size')::bigint, " +
              "pg_relation_size(c.oid), " +
              "greatest(c.reltuples::bigint, 0) " +
              "FROM _graft_kids k JOIN pg_class c ON c.oid = k.oid " +
              "JOIN pg_namespace n ON n.oid = c.relnamespace " +
              "ORDER BY 1").rows
            // HEAP leaves only ('r'): intermediate partitioned
            // parents ('p') recurse, and FOREIGN partitions ('f') are
            // deliberately excluded — they have no local storage or
            // WAL, so logical replication can never stream their
            // changes; snapshotting them once and never updating them
            // would leave a silently-stale subset (the reference's
            // blocks>0 filter drops them the same way,
            // qrep_partition.go:389)
            .filter(r => r(1).contains("r"))
            .map(r => Leaf(r(0).get, r(2).getOrElse("0").toLong,
              r(3).getOrElse("0").toLong, r(4).getOrElse("0").toLong))
          // an inheritance ROOT stores rows itself; a partitioned
          // parent never does
          if (relkind == "p") kids else selfLeaf() +: kids
        }
      }
    }

    val totBlocks = leaves.map(_.blocks).sum
    val n = sliceCount(totBlocks, leaves.map(_.bytes).sum,
      leaves.map(_.rows).sum, numPartitions, rowsPerPartition)
    val per = math.max(1L, (totBlocks + n - 1) / n)
    val packed = packSlices(leaves.map(l => (l.sql, l.blocks)), per)
    // an all-empty relation set still gets one open-ended scan of
    // the parent — matches the previous posture for plain tables
    // (rows landing between probe and scan stay covered; a
    // partitioned parent's scan is simply empty)
    if (packed.nonEmpty) packed
    else Seq(Seq((tableSql, 0L, None)))
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
      numPartitions: Int = 0, rowsPerPartition: Option[Long] = None,
      recreateSlot: Boolean = false)
      : MirrorRunner = {
    val url = cfg.captureDir.getOrElse(throw new IllegalArgumentException(
      "initialLoad needs captureDir = pgwire://…"))
    require(graft.cdc.ChangeLogWal.headCp(cfg.walDir) < 0,
      "initialLoad needs a fresh mirror: local WAL already has records")
    // reject bad routes BEFORE any slot is created so a bad config
    // leaves no server-side state behind
    val sourceFor = invertRoutes(cfg)
    // Crash auto-recovery is gated on OWNERSHIP, not just freshness:
    // a durable intent marker ("this mirror creates slot X") is
    // written BEFORE CREATE_REPLICATION_SLOT, so on re-EXECUTE an
    // existing INACTIVE slot is reclaimed only when a prior attempt
    // of THIS mirror provably created (or tried to create) it. The
    // fresh-mirror precondition alone cannot prove that — a fresh
    // mirror misconfigured with ANOTHER consumer's slot name would
    // otherwise drop that consumer's slot while it was briefly
    // offline, destroying its replication position. Without a prior
    // intent, the 42710 surfaces and a human decides (RESYNC forces).
    val slotName = CaptureEndpoint.parse(url).param("slot", "graft_slot")
    val intentPath = s"${cfg.walDir}/_graft_slot_intent"
    val hc = spark.sparkContext.hadoopConfiguration
    val priorIntent = graft.util.FsText.read(intentPath, hc)
      .exists(_.trim == slotName)
    graft.util.FsText.write(intentPath, slotName, hc)
    val session =
      try createExportedSlot(url, recreate = recreateSlot,
        recoverInactive = priorIntent)
      catch {
        // a FIRST attempt refused by 42710 proves the slot existed
        // before us (someone else's): the just-written intent must
        // not survive, or a plain retry would read it as "our crashed
        // attempt created this" and reclaim the foreign slot — the
        // exact outcome the ownership gate exists to prevent
        case e: graft.server.PgClient.PgServerError
            if e.sqlState == "42710" && !priorIntent =>
          try graft.util.FsText.delete(intentPath, hc)
          catch { case scala.util.control.NonFatal(_) => () }
          throw e
      }
    // PEERDB_SKIP_SNAPSHOT_EXPORT (dynamicconf.go:390): the slot (and
    // its consistent point) stands, but the snapshot-holding session
    // closes NOW and the reads run without SET TRANSACTION SNAPSHOT —
    // a dropped connection can no longer kill a long initial load.
    // Rows changed between slot creation and a slice's read arrive
    // twice (read + slot replay); the version-idempotent merge
    // converges them, matching the reference's documented risk
    // posture (postgres_source.go:651-658).
    val skipExport = Settings.get(spark,
      "mirror.skip_snapshot_export", cfg.env).exists(_.toBoolean)
    val snapshotName =
      if (skipExport) { session.close(); "" }
      else session.exported.snapshotName
    try {
      val cfg2 = cfg.copy(snapshotCheckpoint = 0L)
      val runner = new MirrorRunner(spark, cfg2)
      val tables = (cfg.destinationTable ->
        TableConfig(cfg.pkColumns, cfg.payloadSchema)) +:
        cfg.extraTables.toSeq
      tables.foreach { case (table, tc) =>
        val sourceRel = sourceFor.getOrElse(table, table)
        runner.bootstrapSnapshot(table, readTable(spark, url,
          snapshotName, sourceRel, tc.effectiveSchema,
          numPartitions, rowsPerPartition), sourceTable = sourceRel)
      }
      runner
    } finally if (!skipExport) session.close()
  }
}
