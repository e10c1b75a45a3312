package graft.mirror

import org.apache.hadoop.conf.Configuration

import graft.cdc.CaptureEndpoint

/** DROP MIRROR's server-side cleanup — the reference's DropFlowWorkflow
  * legs (flow/workflows/drop_flow.go:39-101):
  *
  *   - DropFlowSource → PullFlowCleanup (postgres_source.go:836-865):
  *     drop the replication slot if it exists, then the publication —
  *     OWNERSHIP-GATED. The reference only ever drops the default-named
  *     slot/publication it created itself (GetDefaultSlotName /
  *     GetDefaultPublicationName); a user-provided name is user-owned
  *     state and survives the mirror. Here the engine defaults
  *     (`graft_slot`/`graft_pub`) qualify, plus a custom-named slot
  *     whose creation THIS mirror durably recorded (the initialLoad
  *     intent marker, [[SnapshotFlow.initialLoad]]). MySQL and Mongo
  *     sources are no-ops (mysql/cdc.go:546, mongo/cdc.go:690 —
  *     binlog/resume positions live client-side, nothing server-side
  *     to release).
  *   - DropFlowDestination → SyncFlowCleanup (postgres_destination.go:
  *     591-624): STAGING state goes — the raw changefeed and job
  *     metadata — while the normalized destination tables remain.
  *     Here: the local raw dir, checkpoint dir and captured WAL dir,
  *     plus the `_peerdb_raw_<flow>` table on clickhouse://
  *     destinations (the one live warehouse that keeps a server-side
  *     raw table; the REST warehouses stage per-batch temp tables that
  *     each batch already drops).
  *
  * Both legs return the actions they took (for SHOW-style feedback and
  * the spec's assertions). Absent objects are fine (the reference's
  * `IF EXISTS` posture); an unreachable source is an error — the
  * catalog entry stays, like the reference's failed DropFlowWorkflow.
  */
object DropFlow {

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Source leg. Returns the dropped objects ("slot:x", "publication:y"). */
  def sourceCleanup(captureUrl: String, walDir: Option[String],
      hc: Configuration): Seq[String] = {
    val ep = CaptureEndpoint.parse(captureUrl)
    if (ep.scheme != "pgwire") return Nil // mysql/mongo: nothing server-side
    val slot = ep.param("slot", "graft_slot")
    val pub = ep.param("publication", "graft_pub")
    val intent = walDir.flatMap(d =>
      graft.util.FsText.read(s"$d/_graft_slot_intent", hc)).map(_.trim)
    val ownSlot = slot == "graft_slot" || intent.contains(slot)
    val ownPub = pub == "graft_pub"
    if (!ownSlot && !ownPub) return Nil
    val c = graft.server.PgClients.connect(ep, Nil)
    try {
      val actions = Seq.newBuilder[String]
      if (ownSlot) {
        // one statement, reference-shaped: absent slot = zero rows
        val r = c.query("SELECT pg_drop_replication_slot(slot_name) " +
          s"FROM pg_replication_slots WHERE slot_name=${lit(slot)}")
        if (r.rows.nonEmpty) actions += s"slot:$slot"
      }
      if (ownPub) {
        // existence probe first: DROP PUBLICATION IF EXISTS needs
        // permissions on publications we did not create
        // (postgres_source.go:846-848)
        val exists = c.query("SELECT 1 FROM pg_publication WHERE " +
          s"pubname=${lit(pub)}").rows.nonEmpty
        if (exists) {
          c.query("DROP PUBLICATION IF EXISTS \"" +
            pub.replace("\"", "\"\"") + "\"")
          actions += s"publication:$pub"
        }
      }
      actions.result()
    } finally c.close()
  }

  /** The mirror's flow name from its catalog options — MUST stay the
    * same derivation as `MirrorConfig.flow` (flow_name option, falling
    * back to the destination table): a mismatch here would IF-EXISTS
    * no-op on a nonexistent raw table and orphan the real one. */
  private[mirror] def flowOf(options: Map[String, String]): String =
    options.get("flow_name").filter(_.nonEmpty)
      .orElse(options.get("table"))
      .getOrElse("dest")

  /** Destination leg. Returns the removed staging state. */
  def destinationCleanup(options: Map[String, String],
      hc: Configuration): Seq[String] = {
    val actions = Seq.newBuilder[String]
    // the ClickHouse raw table (cdc.go:29-45) — drop BEFORE the local
    // state so a connection failure leaves everything for a retry
    options.get("dest_url").filter(_.startsWith("clickhouse://"))
      .foreach { url =>
        val flow = flowOf(options)
        val raw = graft.sinks.ClickHouseSql.rawTableName(flow)
        new graft.sinks.ClickHouseExecutor(url)
          .execute(s"DROP TABLE IF EXISTS `$raw`")
        actions += s"raw_table:$raw"
      }
    // local staging state: raw changefeed, checkpoints, captured WAL —
    // the normalized dest_dir REMAINS (SyncFlowCleanup drops raw +
    // metadata, never the destination data)
    val dirs =
      options.get("raw_dir").orElse(
        options.get("dest_dir").map(_ + "_raw")).map("raw" -> _) ++
        options.get("checkpoint_dir").map("checkpoints" -> _) ++
        options.get("wal_dir").map("wal" -> _)
    dirs.foreach { case (kind, dir) =>
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(hc)
      if (fs.exists(p)) { fs.delete(p, true); actions += s"$kind:$dir" }
    }
    actions.result()
  }
}
