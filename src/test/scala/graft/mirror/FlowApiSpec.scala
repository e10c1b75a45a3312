package graft.mirror

import graft.SparkSpec
import graft.model.ChangeRecord

/** The typed route-API facade drives the full lifecycle the gRPC
  * surface owns: peers, CDC flows, state changes, stats, scripts,
  * settings, tags, maintenance — over the same executor as the SQL
  * façade (so the two can never diverge). */
class FlowApiSpec extends SparkSpec {

  test("route-API gap-close RPCs: alert-config CRUD feeding a live " +
    "Alerter, peer info redaction, schema/table introspection, type " +
    "conversion matrix, slot info/history, CDC graph, instance info") {
    val api = new FlowApi(spark)
    val base = tmpDir("flowapi2")

    // alert-config CRUD (GetAlertConfigs/PostAlertConfig/Delete…)
    api.postAlertConfig(1, slotLagMbThreshold = 10)
    api.postAlertConfig(2, slotLagMbThreshold = 99999,
      alertForMirrors = Seq("only_this"))
    assert(api.getAlertConfigs().map(_.id) == Seq(1L, 2L))
    api.postAlertConfig(1, slotLagMbThreshold = 20) // upsert by id
    assert(api.getAlertConfigs().find(_.id == 1)
      .get.slotLagMbThreshold == 20L)
    // the stored configs materialize as a working Alerter
    val fired = api.alerter().alertIfSlotLag("f1", "p1", "s1", 500L)
    assert(fired.map(_.senderId) == Seq(1L)) // 2's threshold too high
    api.deleteAlertConfig(2)
    assert(api.getAlertConfigs().map(_.id) == Seq(1L))

    // GetPeerInfo redacts credential-looking options
    api.createPeer("fa_red", "parquet", Map(
      "path" -> "/x", "password" -> "hunter2", "api_key" -> "k"))
    val (kind, opts) = api.getPeerInfo("fa_red")
    assert(kind == "parquet" && opts("path") == "/x")
    assert(opts("password") == "********" && opts("api_key") == "********")

    // schemas/tables introspection over a directory peer
    api.createPeer("fa_dir", "parquet",
      Map("path" -> "/root/testdata/sf0.001"))
    val schemas = api.getSchemas("fa_dir")
    assert(schemas.contains("public"))
    assert(api.getTablesInSchema("fa_dir", "public")
      .contains("lineitem"))
    assert(api.getPublications("fa_dir").isEmpty)

    // the type-conversion matrix comes from the live toDdl mapping
    val conv = api.getColumnsTypeConversion()
    assert(conv("int64")("ClickHouse") == "Nullable(Int64)")
    assert(conv("string")("Snowflake").nonEmpty)
    assert(conv.contains("timestamptz"))

    // slot info/history + cdc graph over a drained mirror
    api.createCdcFlow("fa_g", Map(
      "wal_dir" -> s"$base/wal", "dest_dir" -> s"$base/dest",
      "checkpoint_dir" -> s"$base/ckpt", "pk" -> "id",
      "table" -> "t", "schema" -> "id BIGINT, v STRING",
      "stats" -> s"$base/stats"))
    graft.cdc.ChangeLogWal.append(s"$base/wal", Seq(
      ChangeRecord(0, 1L, "1", 1000000L, 1L, "t", "t",
        """{"id":1,"v":"a"}""", null, Nil),
      ChangeRecord(0, 2L, "2", 2000000L, 2L, "t", "t",
        """{"id":2,"v":"b"}""", null, Nil)))
    api.customSync("fa_g")
    val graph = api.cdcGraph("fa_g", bucketMinutes = 5).collect()
    assert(graph.length == 1 && graph.head.getAs[Long]("rows") == 2L)
    // slot gauge history lands via the metrics path, then reads back
    val st = new StatsCatalog(s"$base/stats",
      spark.sparkContext.hadoopConfiguration)
    st.appendSlotSize("p1", "slot_a", 2L, 0L); st.flush()
    assert(api.getSlotInfo("fa_g").filter("slot_name = 'slot_a'")
      .count() == 1L)
    assert(api.getSlotLagHistory("fa_g", "slot_a").count() == 1L)
    assert(api.initialLoadSummary("fa_g").count() == 0L) // no snapshot ran

    // instance + stat info
    assert(api.getInstanceInfo().sparkVersion == spark.version)
    assert(api.getStatInfo().forall(_.id.nonEmpty))
  }

  test("route-API facade: peer + mirror lifecycle, sync, stats, " +
    "scripts, settings, tags, maintenance") {
    val api = new FlowApi(spark)
    val base = tmpDir("flowapi")

    // peers (CreatePeer/ListPeers/GetPeerType/ValidatePeer)
    api.createPeer("fa_peer", "parquet",
      Map("path" -> "/root/testdata/sf0.001/lineitem.parquet"))
    assert(api.listPeers().exists(_.name == "fa_peer"))
    assert(api.getPeerType("fa_peer") == "parquet")
    val v = api.validatePeer("fa_peer")
    assert(v.status == "valid", v)
    assert(api.validatePeer("fa_peer").name == "fa_peer")

    // CDC flow (CreateCDCFlow) + validation + manual sync (CustomSync)
    val name = api.createCdcFlow("fa_m", Map(
      "wal_dir" -> s"$base/wal", "dest_dir" -> s"$base/dest",
      "checkpoint_dir" -> s"$base/ckpt", "pk" -> "id",
      "table" -> "t", "schema" -> "id BIGINT, v STRING",
      "stats" -> s"$base/stats"))
    assert(name == "fa_m")
    assert(api.listMirrorNames().contains("fa_m"))
    // pre-WAL: only the WAL-reachability check flags (never throws)
    assert(api.validateCdcMirror("fa_m")
      .filter(_.status != "valid").map(_.name) == Seq("wal_dir"))
    graft.cdc.ChangeLogWal.append(s"$base/wal", Seq(
      ChangeRecord(0, 1L, "1", 1000000L, 1L, "t", "t",
        """{"id":1,"v":"a"}""", null, Nil)))
    assert(api.validateCdcMirror("fa_m").forall(_.status == "valid"),
      api.validateCdcMirror("fa_m").mkString(","))
    // CDC drains report -1 (counts live in the stats catalog)
    assert(api.customSync("fa_m") == -1L)

    // stats (CDCBatches / TotalRowsSynced / RowCounts / MirrorLogs)
    assert(api.totalRowsSynced("fa_m") == 1L)
    assert(api.cdcBatches("fa_m").count() == 1L)
    assert(api.mirrorRowCounts("fa_m").count() >= 1L)
    assert(api.listMirrorLogs("fa_m").count() == 0L)

    // a recorded flow error lists back CLASSIFIED (the reference's
    // ErrorClass taxonomy rides the log listing)
    new StatsCatalog(s"$base/stats",
      spark.sparkContext.hadoopConfiguration).logFlowError("fa_m",
      "capture pull failed (3/20): 1045 28000: Access denied for " +
        "user 'repl'@'10.0.0.7' (using password: YES)")
    val logRow = api.listMirrorLogs("fa_m")
      .select("error_class", "error_action", "error_source",
        "error_code").head()
    assert(logRow.getString(0) == "NOTIFY_CONNECTIVITY")
    assert(logRow.getString(1) == "notify_user")
    assert(logRow.getString(2) == "mysql" && logRow.getString(3) == "1045")

    // status + state machine (MirrorStatus / FlowStateChange)
    assert(api.mirrorStatus("fa_m").status == "idle")
    api.flowStateChange("fa_m", "STATUS_RUNNING")
    assert(api.mirrorStatus("fa_m").status == "running")
    api.flowStateChange("fa_m", "PAUSED")
    assert(api.mirrorStatus("fa_m").status != "running")
    intercept[IllegalArgumentException](
      api.flowStateChange("fa_m", "SIDEWAYS"))

    // tags (CreateOrReplaceFlowTags/GetFlowTags)
    api.setFlowTags("fa_m", Map("env" -> "prod", "team" -> "data"))
    assert(api.getFlowTags("fa_m") ==
      Map("env" -> "prod", "team" -> "data"))

    // scripts (PostScript/GetScripts/DeleteScript)
    api.postScript("fa_s", "sql", "named_struct('data', data)")
    assert(api.getScripts().exists(_.name == "fa_s"))
    api.deleteScript("fa_s")
    assert(!api.getScripts().exists(_.name == "fa_s"))

    // settings + maintenance gate
    assert(api.getDynamicSettings().nonEmpty)
    api.maintenance(true)
    assert(api.getMaintenanceStatus())
    intercept[IllegalStateException](api.customSync("fa_m"))
    api.maintenance(false)
    assert(!api.getMaintenanceStatus())

    // terminate (FlowStateChange TERMINATED) + cleanup
    api.flowStateChange("fa_m", "TERMINATED")
    assert(!api.listMirrorNames().contains("fa_m"))
    api.dropPeer("fa_peer")
    assert(!api.listPeers().exists(_.name == "fa_peer"))
    assert(api.getVersion().nonEmpty)
  }

  test("route-API tail: SkipSnapshotWaitFlows requires running " +
    "maintenance and accumulates the durable skip set; " +
    "ResetMirrorSequences enforces the PG-destination precondition " +
    "and runs the reference's DO block through the executor seam") {
    val api = new FlowApi(spark)
    val base = tmpDir("flowapi_tail")

    // SkipSnapshotWaitFlows: the reference refuses when the
    // StartMaintenance workflow is not running (handler.go:900-905)
    val (sent0, msg0) = api.skipSnapshotWaitFlows(Seq("f1"))
    assert(!sent0 && msg0.contains("not currently running"))
    api.maintenance(true)
    val (sent1, msg1) = api.skipSnapshotWaitFlows(Seq("f1", "f2"))
    assert(sent1 && msg1.contains("2 flows"))
    assert(api.skippedSnapshotWaitFlows() == Seq("f1", "f2"))
    // repeats accumulate without duplicating
    assert(api.skipSnapshotWaitFlows(Seq("f2", "f3"))._1)
    assert(api.skippedSnapshotWaitFlows() == Seq("f1", "f2", "f3"))
    api.maintenance(false)

    // ResetMirrorSequences over a cataloged mirror
    api.createCdcFlow("fa_seq", Map(
      "wal_dir" -> s"$base/wal", "dest_dir" -> s"$base/dest",
      "checkpoint_dir" -> s"$base/ckpt", "pk" -> "id",
      "table" -> "public.owners", "schema" -> "id BIGINT, v STRING"))
    // parquet destinations (the engine default) fail the precondition,
    // exactly the reference's FailedPrecondition branch
    val (ok0, err0) = api.resetMirrorSequences("fa_seq")
    assert(!ok0 && err0.contains("only supported for PostgreSQL"))
    val (ok1, err1) = api.resetMirrorSequences("fa_seq",
      Some(("clickhouse", new graft.sinks.SqlExecutor {
        override def execute(sql: String): Unit = fail("must not run")
        override def loadAvro(t: String, f: Seq[String],
            s: org.apache.spark.sql.types.StructType): Unit = ()
      })))
    assert(!ok1 && err1.contains("only supported for PostgreSQL"))
    // a postgres destination runs exactly one DO block naming the
    // mirror's destination tables
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val (ok2, err2) = api.resetMirrorSequences("fa_seq",
      Some(("postgres", new graft.sinks.SqlExecutor {
        override def execute(sql: String): Unit = ran += sql
        override def loadAvro(t: String, f: Seq[String],
            s: org.apache.spark.sql.types.StructType): Unit = ()
      })))
    assert(ok2 && err2.isEmpty)
    assert(ran.size == 1)
    val sql = ran.head
    // the quoted chain preserves case through the DO block's
    // ::regclass / pg_get_serial_sequence identifier parsing
    assert(sql.contains("ARRAY['\"public\".\"owners\"']::text[]"), sql)
    assert(sql.contains("pg_get_serial_sequence"))
    assert(sql.contains("setval(v_seq, v_max, true)"))
    assert(sql.contains("NOT a.attisdropped"))
    // executor failure surfaces as (false, message), never a throw
    val (ok3, err3) = api.resetMirrorSequences("fa_seq",
      Some(("postgres", new graft.sinks.SqlExecutor {
        override def execute(sql: String): Unit =
          throw new RuntimeException("connection refused")
        override def loadAvro(t: String, f: Seq[String],
            s: org.apache.spark.sql.types.StructType): Unit = ()
      })))
    assert(!ok3 && err3.contains("failed to reset sequences"))
    // quoting: a table name with a quote is ''-escaped into the array
    // (around the identifier-quoted chain)
    assert(graft.sinks.MergeSqlGenerator
      .resetSequencesSql(Seq("sch.o'brien"))
      .contains("ARRAY['\"sch\".\"o''brien\"']::text[]"))
    api.flowStateChange("fa_seq", "TERMINATED")
  }
}
