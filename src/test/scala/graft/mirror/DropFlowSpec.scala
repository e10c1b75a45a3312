package graft.mirror

import graft.SparkSpec
import graft.cdc.StockPostgres
import graft.model.ChangeRecord

/** DROP MIRROR's server-side cleanup legs (drop_flow.go:39-101)
  * against a REAL stock PostgreSQL: slot + publication release is
  * ownership-gated exactly like the reference (defaults and
  * intent-proven slots drop; user-provided names survive), and the
  * destination leg removes STAGING state only — the normalized
  * destination data remains. */
class DropFlowSpec extends SparkSpec {

  private var server: Option[StockPostgres.Server] = None
  override def beforeAll(): Unit = {
    super.beforeAll()
    server = StockPostgres.start()
  }
  override def afterAll(): Unit = {
    server.foreach(_.stop())
    super.afterAll()
  }
  private def srv: StockPostgres.Server = {
    assume(server.isDefined, "stock postgres unavailable in this env")
    server.get
  }
  private def hc = spark.sparkContext.hadoopConfiguration
  private def url(params: String = "") =
    s"pgwire://postgres@127.0.0.1:${srv.port}/postgres$params"

  test("destinationCleanup derives the ClickHouse raw-table flow the " +
    "SAME way MirrorConfig.flow does: flow_name first (the key the " +
    "catalog stores), then the table fallback — a 'flow' key is NOT " +
    "consulted (a mirror created with flow_name would otherwise drop " +
    "the wrong _peerdb_raw_* table and orphan the real one)") {
    assert(DropFlow.flowOf(Map(
      "flow_name" -> "named_flow", "table" -> "dest.t")) == "named_flow")
    assert(DropFlow.flowOf(Map(
      "flow_name" -> "", "table" -> "dest.t")) == "dest.t")
    assert(DropFlow.flowOf(Map("table" -> "dest.t")) == "dest.t")
    assert(DropFlow.flowOf(Map.empty) == "dest")
    // and the raw-table image matches what the live mirror creates
    assert(graft.sinks.ClickHouseSql.rawTableName("named_flow") ==
      graft.sinks.ClickHouseSql.rawTableName(
        graft.mirror.MirrorConfig("", "", "", "", Nil,
          new org.apache.spark.sql.types.StructType(),
          destinationTable = "dest.t",
          flowName = "named_flow").flow))
  }

  test("sourceCleanup drops the engine-default slot and publication " +
    "(PullFlowCleanup, postgres_source.go:836-865); a second run is a " +
    "clean no-op (absent objects are fine)") {
    val s = srv
    s.psql("SELECT pg_create_logical_replication_slot(" +
      "'graft_slot', 'pgoutput')")
    s.psql("CREATE PUBLICATION graft_pub FOR ALL TABLES")
    val actions = DropFlow.sourceCleanup(url(), None, hc)
    assert(actions.toSet ==
      Set("slot:graft_slot", "publication:graft_pub"))
    assert(s.psql("SELECT count(*) FROM pg_replication_slots " +
      "WHERE slot_name='graft_slot'").trim == "0")
    assert(s.psql("SELECT count(*) FROM pg_publication " +
      "WHERE pubname='graft_pub'").trim == "0")
    // idempotent: nothing left to drop, no error
    assert(DropFlow.sourceCleanup(url(), None, hc).isEmpty)
  }

  test("user-provided slot/publication names are user-owned and " +
    "SURVIVE the drop — unless the mirror's intent marker proves it " +
    "created the slot (initialLoad ownership)") {
    val s = srv
    s.psql("SELECT pg_create_logical_replication_slot(" +
      "'user_slot', 'pgoutput')")
    s.psql("CREATE PUBLICATION user_pub FOR ALL TABLES")
    val u = url("?slot=user_slot&publication=user_pub")
    // no intent marker: both survive
    assert(DropFlow.sourceCleanup(u, None, hc).isEmpty)
    assert(s.psql("SELECT count(*) FROM pg_replication_slots " +
      "WHERE slot_name='user_slot'").trim == "1")
    // an intent marker recording THIS slot's creation flips slot
    // ownership (the publication stays user-owned either way)
    val wal = tmpDir("dropflow_wal")
    graft.util.FsText.write(s"$wal/_graft_slot_intent", "user_slot", hc)
    val actions = DropFlow.sourceCleanup(u, Some(wal), hc)
    assert(actions == Seq("slot:user_slot"))
    assert(s.psql("SELECT count(*) FROM pg_replication_slots " +
      "WHERE slot_name='user_slot'").trim == "0")
    assert(s.psql("SELECT count(*) FROM pg_publication " +
      "WHERE pubname='user_pub'").trim == "1")
    s.psql("DROP PUBLICATION user_pub")
  }

  test("DROP MIRROR through the DDL removes staging state (raw " +
    "changefeed, checkpoints, wal) and keeps the normalized " +
    "destination (SyncFlowCleanup semantics)") {
    val wal = tmpDir("dropddl_wal")
    val base = tmpDir("dropddl_base")
    graft.cdc.ChangeLogWal.append(wal, Seq(
      ChangeRecord(ChangeRecord.TypeInsert, 1L, "1", 1000L, 0L,
        "public.t", "dest.t", """{"id":1,"v":10}""", null, Nil),
      ChangeRecord(ChangeRecord.TypeInsert, 2L, "2", 2000L, 0L,
        "public.t", "dest.t", """{"id":2,"v":20}""", null, Nil)))
    def run(sql: String) = GraftSql.execute(spark,
      GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))
    run(s"""CREATE MIRROR dropddl WITH (
       |  wal_dir '$wal', dest_dir '$base/dest',
       |  checkpoint_dir '$base/ckpt', raw_dir '$base/raw', pk 'id',
       |  table 'dest.t', schema 'id BIGINT, v BIGINT')""".stripMargin)
    run("EXECUTE MIRROR dropddl")
    assert(spark.read.parquet(s"$base/dest").count() == 2)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(hc)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$base/raw")))
    run("DROP MIRROR dropddl")
    // staging gone, destination intact, wal gone
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/raw")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/ckpt")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(wal)))
    assert(spark.read.parquet(s"$base/dest").count() == 2)
  }

  test("DROP MIRROR on a qrep entry clears the watermark resume point " +
    "(the lastRangeEnd store) but keeps the destination data — a " +
    "recreated mirror starts over, append-duplicating like a fresh " +
    "flow would") {
    import org.apache.spark.sql.SparkSession
    val s = spark.newSession()
    SparkSession.setActiveSession(s)
    try {
      def run(sql: String) = GraftSql.execute(s,
        GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))
      val base = tmpDir("dropqrep")
      s.range(0, 30).selectExpr("id AS k", "id * 2 AS v")
        .write.parquet(s"$base/src/rows.parquet")
      run(s"CREATE PEER dqsrc TYPE parquet OPTIONS (dir '$base/src')")
      run(s"CREATE PEER dqdst TYPE parquet OPTIONS (dir '$base/dst')")
      def create() = run(
        "CREATE MIRROR dq FROM dqsrc TO dqdst FOR " +
          "$$ SELECT k, v FROM rows WHERE k BETWEEN {{.start}} AND " +
          "{{.end}} $$ WITH (watermark_column 'k', " +
          s"source_table 'rows', dest_dir '$base/dest')")
      create()
      assert(run("EXECUTE MIRROR dq").head.getLong(0) == 30L)
      assert(run("EXECUTE MIRROR dq").head.getLong(0) == 0L)
      run("DROP MIRROR dq")
      val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(hc)
      assert(!fs.exists(
        new org.apache.hadoop.fs.Path(s"$base/dest/_graft_wmark")))
      assert(s.read.parquet(s"$base/dest").count() == 30,
        "destination data remains after the drop")
      // recreated = fresh flow: no resume point, the full range
      // re-pulls (append disposition duplicates, as a new flow would)
      create()
      assert(run("EXECUTE MIRROR dq").head.getLong(0) == 30L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
