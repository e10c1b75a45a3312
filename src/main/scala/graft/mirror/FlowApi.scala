package graft.mirror

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Programmatic route-API facade — the reference's gRPC surface
  * (protos/route.proto, served by the flow/cmd handlers) mapped onto the
  * engine's SQL-façade statements and catalogs, so an application can
  * embed the engine with TYPED calls instead of SQL strings. Each
  * method names the RPC it restates; responses are plain case classes
  * carrying the proto messages' information content (not their
  * encoding). RPCs whose substance is Temporal workflow plumbing
  * (workflow ids, activity heartbeats) return the engine-native
  * equivalent — here the flow NAME is the workflow handle, because
  * supervision is Spark checkpoints + the driver (SURVEY §7.3), not a
  * workflow engine.
  *
  * Everything delegates to [[GraftSql]]'s statement executor, so the
  * SQL façade and this API can never diverge: they are two syntaxes
  * over one implementation — exactly the reference's split between
  * nexus (SQL) and flow-api (gRPC) over one catalog.
  */
final class FlowApi(spark: SparkSession) {

  import GraftSql._

  private def exec(st: Statement) = GraftSql.execute(spark, st)

  // ------------------------------------------------------------- peers

  final case class PeerInfo(name: String, kind: String)
  final case class Validation(name: String, status: String,
      message: String)

  /** CreatePeer (route.proto:570). */
  def createPeer(name: String, kind: String,
      options: Map[String, String]): Unit =
    exec(CreatePeer(name, kind, options))

  /** DropPeer (route.proto:576). */
  def dropPeer(name: String): Unit = exec(DropPeer(name))

  /** ListPeers (route.proto:782). */
  def listPeers(): Seq[PeerInfo] =
    exec(ShowPeers).map(r => PeerInfo(r.getString(0), r.getString(1)))

  /** GetPeerType (route.proto:777). */
  def getPeerType(name: String): String =
    listPeers().find(_.name == name)
      .getOrElse(throw new NoSuchElementException(s"peer $name")).kind

  /** ValidatePeer (route.proto:557) — never throws. */
  def validatePeer(name: String): Validation = {
    val r = exec(ValidatePeerStmt(name)).head
    Validation(r.getString(0), r.getString(1), r.getString(2))
  }

  /** GetAllTables (route.proto:674). */
  def getAllTables(peer: String): Seq[String] =
    exec(ShowPeerTables(peer)).map(_.getString(0))

  /** GetColumns (route.proto:681): (column, type, nullable). */
  def getColumns(peer: String, table: String)
      : Seq[(String, String, Boolean)] =
    exec(DescribePeerTable(peer, table)).map(r =>
      (r.getString(0), r.getString(1), r.getString(2) == "true"))

  // ----------------------------------------------------------- mirrors

  final case class MirrorStatus(name: String, walDir: String,
      destDir: String, status: String)

  /** CreateCDCFlow (route.proto:583): the FlowConnectionConfigs fields
    * travel as the CREATE MIRROR option map; the returned "workflow
    * id" is the flow name (see class doc). */
  def createCdcFlow(name: String, options: Map[String, String]): String = {
    exec(CreateMirror(name, options)); name
  }

  /** CreateQRepFlow (route.proto:589). */
  def createQRepFlow(name: String, sourcePeer: String, destPeer: String,
      queryTemplate: String, options: Map[String, String]): String = {
    exec(CreateQRepMirror(name, sourcePeer, destPeer, queryTemplate,
      options))
    name
  }

  /** ValidateCDCMirror (route.proto:563) — per-check result rows. */
  def validateCdcMirror(name: String): Seq[Validation] =
    exec(ValidateMirrorStmt(name)).map(r =>
      Validation(r.getString(0), r.getString(1), r.getString(2)))

  /** CustomSync (the manual one-sync trigger): drains the WAL once.
    * Returns rows moved for snapshot-only flows; −1 for CDC drains,
    * whose per-batch counts live in the stats catalog
    * ([[totalRowsSynced]]/[[cdcBatches]]) — same split as the
    * reference, where CustomSync returns and monitoring carries the
    * numbers. */
  def customSync(name: String): Long =
    exec(ExecuteMirror(name)).head.getLong(0)

  /** FlowStateChange (route.proto:730): the FlowStatus transitions the
    * handler accepts — RUNNING (resume), PAUSED (pause), TERMINATED
    * (drop), RESYNC (rebuild). */
  def flowStateChange(name: String, requestedState: String): Unit =
    requestedState.toUpperCase match {
      case "RUNNING" | "STATUS_RUNNING" => exec(ResumeMirror(name))
      case "PAUSED" | "STATUS_PAUSED" => exec(PauseMirror(name))
      case "TERMINATED" | "STATUS_TERMINATED" => exec(DropMirror(name))
      case "RESYNC" | "STATUS_RESYNC" => exec(ResyncMirror(name))
      case other => throw new IllegalArgumentException(
        s"unsupported flow state transition: $other")
    }

  /** MirrorStatus (route.proto:737). */
  def mirrorStatus(name: String): MirrorStatus =
    listMirrors().find(_.name == name)
      .getOrElse(throw new NoSuchElementException(s"mirror $name"))

  /** ListMirrors (route.proto:718). */
  def listMirrors(): Seq[MirrorStatus] =
    exec(ShowMirrors).map(r => MirrorStatus(r.getString(0),
      r.getString(1), r.getString(2), r.getString(3)))

  /** ListMirrorNames (route.proto:723). */
  def listMirrorNames(): Seq[String] = listMirrors().map(_.name)

  // ------------------------------------------------- stats & logs

  /** GetCDCBatches / CDCBatches (route.proto:744,750): the batches
    * frame of the mirror's peerdb_stats catalog. */
  def cdcBatches(name: String): DataFrame = {
    exec(ShowStats(name)) // registers stats_* views
    spark.table("stats_cdc_batches")
  }

  /** GetMirrorRowCounts / CDCTableTotalCounts (route.proto:855,647). */
  def mirrorRowCounts(name: String): DataFrame = {
    exec(ShowStats(name))
    spark.table("stats_cdc_table_aggregate_counts")
  }

  /** TotalRowsSyncedByMirror (route.proto:834). */
  def totalRowsSynced(name: String): Long = {
    val b = cdcBatches(name)
    import org.apache.spark.sql.functions._
    val r = b.agg(sum("rows_in_batch")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** ListMirrorLogs (route.proto:711): the flow_errors rows, each
    * classified into the reference's ErrorClass taxonomy
    * (flow/alerting/classifier.go) — the triage buckets ops filters
    * on (connectivity vs slot-invalid vs destination-modified …) plus
    * the class's action (notify_user / ignore / notify_telemetry). */
  def listMirrorLogs(name: String): DataFrame = {
    exec(ShowStats(name))
    import org.apache.spark.sql.functions.{col, udf}
    val cls = udf { (msg: String) =>
      val (c, i) = ErrorClassifier.classifyMessage(msg)
      (c.name, c.action, i.source, i.code)
    }
    spark.table("stats_flow_errors")
      .filter(col("flow_name") === name)
      .withColumn("_cls", cls(col("error_message")))
      .withColumn("error_class", col("_cls._1"))
      .withColumn("error_action", col("_cls._2"))
      .withColumn("error_source", col("_cls._3"))
      .withColumn("error_code", col("_cls._4"))
      .drop("_cls")
  }

  // ---------------------------------------------- settings & scripts

  final case class Setting(name: String, value: String,
      default: String, description: String)
  final case class Script(name: String, lang: String, source: String)

  /** GetDynamicSettings (route.proto:616). */
  def getDynamicSettings(): Seq[Setting] =
    exec(ShowSettings).map(r => Setting(r.getString(0), r.getString(1),
      r.getString(2), r.getString(3)))

  /** PostDynamicSetting (route.proto:622): runtime override through
    * the `spark.graft.*` conf channel ([[Settings]]). */
  def postDynamicSetting(name: String, value: String): Unit =
    spark.conf.set(s"spark.graft.$name", value)

  /** GetScripts (route.proto:630). */
  def getScripts(): Seq[Script] =
    exec(ShowScripts).map(r => Script(r.getString(0), r.getString(1),
      r.getString(2)))

  /** PostScript (route.proto:635) — create-or-replace, like the
    * handler's upsert. */
  def postScript(name: String, lang: String, source: String): Unit =
    exec(CreateScript(name, lang, source, orReplace = true))

  /** DeleteScript (route.proto:641). */
  def deleteScript(name: String): Unit = exec(DropScript(name))

  // ------------------------------------------------------- tags & ops

  /** CreateOrReplaceFlowTags (route.proto:820). */
  def setFlowTags(name: String, tags: Map[String, String]): Unit =
    exec(SetMirrorTags(name, tags))

  /** GetFlowTags (route.proto:828). */
  def getFlowTags(name: String): Map[String, String] =
    exec(ShowTags(name)).map(r => r.getString(0) -> r.getString(1)).toMap

  /** Maintenance start/stop (route.proto:800) via the maintenance.mode
    * dynamic setting — state-changing mirror calls are refused while
    * on, introspection keeps working ([[GraftSql]] gate). */
  def maintenance(enable: Boolean): Unit =
    postDynamicSetting("maintenance.mode", enable.toString)

  /** GetMaintenanceStatus (route.proto:807). */
  def getMaintenanceStatus(): Boolean =
    Settings.get(spark, "maintenance.mode").exists(_.toBoolean)

  /** SkipSnapshotWaitFlows (route.proto; cmd/handler.go:886-928): while
    * maintenance is ON, name flows whose snapshot-wait the maintenance
    * drain must skip. The reference signals the running
    * StartMaintenance workflow; here the skip set is a durable dynamic
    * setting the drain loop reads ([[skippedSnapshotWaitFlows]]) —
    * same precondition (an error when maintenance is not running),
    * same accumulate-on-repeat semantics. Returns
    * (signalSent, message), the proto response pair. */
  def skipSnapshotWaitFlows(flowNames: Seq[String]): (Boolean, String) = {
    if (!getMaintenanceStatus())
      return (false, "maintenance is not currently running")
    val merged = (skippedSnapshotWaitFlows() ++ flowNames).distinct
    postDynamicSetting("maintenance.skipped_snapshot_wait_flows",
      merged.mkString(","))
    (true, "Successfully sent skipped_snapshot_wait_flows signal " +
      s"for ${flowNames.size} flows")
  }

  /** The flows whose snapshot-wait maintenance may skip — what the
    * drain loop consults before blocking on an in-flight snapshot
    * (the StartMaintenanceSignal payload, reset when maintenance
    * turns off via [[maintenance]]'s fresh cycle). */
  def skippedSnapshotWaitFlows(): Seq[String] =
    Settings.get(spark, "maintenance.skipped_snapshot_wait_flows")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  /** ResetMirrorSequences (route.proto; cmd/reset_sequences.go): after
    * an initial load, `setval` every destination-table-owned sequence
    * to MAX(column) so destination inserts resume past the mirrored
    * ids. The reference's preconditions restate exactly: only a
    * PostgreSQL destination qualifies — `destination` binds the
    * deployment's PG connection as (peerKind, executor); None (the
    * engine's parquet destinations) or a non-postgres kind answers the
    * FailedPrecondition message instead of running anything. The
    * statement itself is ONE server-side DO block
    * ([[graft.sinks.MergeSqlGenerator.resetSequencesSql]]), the
    * reference's exact shape. Returns (ok, errorMessage) — the proto
    * response pair. */
  def resetMirrorSequences(name: String,
      destination: Option[(String, graft.sinks.SqlExecutor)] = None)
      : (Boolean, String) = {
    val cfg = GraftSql.mirrorConfigByName(spark, name)
    destination match {
      case None | Some(("parquet", _)) =>
        (false,
          "reset sequences is only supported for PostgreSQL destinations")
      case Some((kind, _)) if kind != "postgres" =>
        (false,
          "reset sequences is only supported for PostgreSQL destinations")
      case Some((_, exec)) =>
        val tables =
          (cfg.destinationTable +: cfg.extraTables.keys.toSeq).distinct
        try {
          exec.execute(
            graft.sinks.MergeSqlGenerator.resetSequencesSql(tables))
          (true, "")
        } catch {
          case e: Exception =>
            (false, s"failed to reset sequences: ${e.getMessage}")
        }
    }
  }

  /** GetVersion (route.proto:788). */
  def getVersion(): String = "graft 0.1.0 (spark-native engine)"

  // -------------------------------------------------- alert configs

  final case class AlertConfig(id: Long, slotLagMbThreshold: Long,
      openConnectionsThreshold: Long, alertForMirrors: Seq[String])

  private def alertCat = GraftSql.alertsFor(spark)

  /** GetAlertConfigs (route.proto:596). */
  def getAlertConfigs(): Seq[AlertConfig] =
    alertCat.list.map { p =>
      AlertConfig(p.name.toLong,
        p.options.getOrElse("slot_lag_mb_threshold", "0").toLong,
        p.options.getOrElse("open_connections_threshold", "0").toLong,
        p.options.get("alert_for_mirrors").toSeq
          .flatMap(_.split(",")).filter(_.nonEmpty))
    }.sortBy(_.id)

  /** PostAlertConfig (route.proto:602) — create-or-replace by id,
    * like the handler's upsert into alerting_config. */
  def postAlertConfig(id: Long, slotLagMbThreshold: Long = 0,
      openConnectionsThreshold: Long = 0,
      alertForMirrors: Seq[String] = Nil): Unit = {
    val p = Peer(id.toString, "alert", Map(
      "slot_lag_mb_threshold" -> slotLagMbThreshold.toString,
      "open_connections_threshold" -> openConnectionsThreshold.toString,
      "alert_for_mirrors" -> alertForMirrors.mkString(",")))
    if (alertCat.list.exists(_.name == p.name)) alertCat.update(p)
    else alertCat.create(p)
  }

  /** DeleteAlertConfig (route.proto:609). */
  def deleteAlertConfig(id: Long): Unit = alertCat.drop(id.toString)

  /** The consumption path: materialize the stored configs as an
    * [[Alerting.Alerter]] — what the reference's alerting loop builds
    * from its alerting_config rows on every tick. */
  def alerter(): Alerting.Alerter = new Alerting.Alerter(
    getAlertConfigs().map(c => Alerting.Sender(c.id,
      c.slotLagMbThreshold, c.openConnectionsThreshold,
      c.alertForMirrors)))

  // ---------------------------------------- peer/slot introspection

  /** GetPeerInfo (route.proto:771): the peer's stored options with
    * credential-looking values REDACTED — the handler masks passwords
    * before returning peer configs to the UI. */
  def getPeerInfo(name: String): (String, Map[String, String]) = {
    val p = GraftSql.peersFor(spark).get(name)
    val redacted = p.options.map { case (k, v) =>
      val lower = k.toLowerCase
      if (lower.contains("password") || lower.contains("secret") ||
        lower.contains("token") || lower.contains("key"))
        k -> "********"
      else k -> v
    }
    (p.kind, redacted)
  }

  /** GetSchemas (route.proto:654): distinct schema qualifiers of the
    * peer's tables (unqualified tables report `public`, the proxy's
    * default namespace). */
  def getSchemas(peer: String): Seq[String] =
    getAllTables(peer).map { t =>
      val i = t.indexOf('.')
      if (i > 0) t.substring(0, i) else "public"
    }.distinct.sorted

  /** GetTablesInSchema (route.proto:668). */
  def getTablesInSchema(peer: String, schema: String): Seq[String] =
    getAllTables(peer).filter { t =>
      val i = t.indexOf('.')
      val s = if (i > 0) t.substring(0, i) else "public"
      s == schema
    }.map { t =>
      val i = t.indexOf('.')
      if (i > 0) t.substring(i + 1) else t
    }.sorted

  /** GetPublications (route.proto:661): PG-server-side publication
    * names. The engine's WAL/capture sources carry the publication in
    * the endpoint URL rather than a queryable server catalog, so the
    * listing is the configured one (empty when not capture-backed). */
  def getPublications(peer: String): Seq[String] = Nil

  /** GetColumnsTypeConversion (route.proto:687): which destination DDL
    * type each engine kind maps to, per warehouse dialect — the
    * information content of the handler's type-conversion matrix,
    * answered from [[graft.types.QKind.toDdl]] (the mapping the sinks
    * actually use, so the API can never drift from the writer). */
  def getColumnsTypeConversion(): Map[String, Map[String, String]] = {
    import graft.types.QKind
    QKind.scalarKinds.map { k =>
      k.name -> QKind.Dialect.all.map(d =>
        d.toString -> QKind.toDdl(k, d)).toMap
    }.toMap
  }

  /** GetSlotInfo (route.proto:693): the newest gauge row per slot from
    * the mirror's peer_slot_size history. */
  def getSlotInfo(name: String): DataFrame = {
    exec(ShowStats(name))
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    spark.table("stats_peer_slot_size")
      .withColumn("rn", row_number().over(Window
        .partitionBy("slot_name").orderBy(col("updated_at").desc)))
      .filter(col("rn") === 1).drop("rn")
  }

  /** GetSlotLagHistory (route.proto:698). */
  def getSlotLagHistory(name: String, slotName: String): DataFrame = {
    exec(ShowStats(name))
    import org.apache.spark.sql.functions.col
    spark.table("stats_peer_slot_size")
      .filter(col("slot_name") === slotName)
      .orderBy("updated_at")
  }

  /** GetStatInfo (route.proto:705): the reference lists server
    * activity (pg_stat_activity); the engine's equivalent is the
    * session's active streaming queries. */
  final case class StatInfo(id: String, name: String, isActive: Boolean)
  def getStatInfo(): Seq[StatInfo] =
    spark.streams.active.toSeq.map(q =>
      StatInfo(q.id.toString, Option(q.name).getOrElse(""), q.isActive))

  // ------------------------------------------------- graphs & loads

  /** CDCGraph (route.proto:757): rows synced per time bucket — the
    * UI's throughput graph, aggregated from cdc_batches. */
  def cdcGraph(name: String, bucketMinutes: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions._
    val ms = bucketMinutes * 60000L
    cdcBatches(name)
      .withColumn("bucket_start_ms",
        (col("start_time") / ms).cast("long") * ms)
      .groupBy("bucket_start_ms")
      .agg(sum("rows_in_batch").as("rows"),
        count(lit(1)).as("batches"))
      .orderBy("bucket_start_ms")
  }

  /** InitialLoadSummary (route.proto:764): the snapshot/QRep runs of
    * the flow with their partition counts. */
  def initialLoadSummary(name: String): DataFrame = {
    exec(ShowStats(name))
    spark.table("stats_qrep_runs")
  }

  /** GetInstanceInfo (route.proto:794). */
  final case class InstanceInfo(sparkVersion: String, master: String,
      defaultParallelism: Int)
  def getInstanceInfo(): InstanceInfo = InstanceInfo(
    spark.version, spark.sparkContext.master,
    spark.sparkContext.defaultParallelism)

  // Documented as not-applicable rather than silently absent:
  // SkipSnapshotWaitFlows (route.proto:813) waits on Temporal workflow
  // signals — the engine has no workflow engine to signal; pause/
  // resume cover the operational need. ResetMirrorSequences
  // (route.proto:848) rewinds warehouse-side sequences — parquet
  // destinations have none. CancelTableAddition (route.proto:841) is
  // [[MirrorRunner.cancelTableAddition]] on the live runner (the
  // mid-snapshot cancel path), not a catalog call.
}
