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

  /** ListMirrorLogs (route.proto:711): the flow_errors rows. */
  def listMirrorLogs(name: String): DataFrame = {
    exec(ShowStats(name))
    import org.apache.spark.sql.functions.col
    spark.table("stats_flow_errors")
      .filter(col("flow_name") === name)
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

  /** GetVersion (route.proto:788). */
  def getVersion(): String = "graft 0.1.0 (spark-native engine)"
}
