package graft.sinks

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.mirror.{MirrorConfig, MirrorRunner}
import graft.model.{ChangeRecord, RawTable}
import graft.types.QKind

/** The live ClickHouse destination over the public HTTP interface: a
  * mirror with `warehouse_url 'clickhouse://…'` ships each batch's raw
  * records as `INSERT … FORMAT JSONEachRow` and normalizes SERVER-side
  * with the reference's `INSERT INTO dest SELECT JSONExtract(…)` into
  * a ReplacingMergeTree (flow/connectors/clickhouse/cdc.go:58-170,
  * normalize_query.go:112-375). The fixture is an in-process HTTP
  * server delegating to [[StubWarehouse]] in CH dialect — the same
  * statement-replay oracle the loader specs use, now reached over the
  * real wire surface the engine speaks. */
class ClickHouseWireSpec extends SparkSpec {

  /** CH HTTP endpoint: query from `?query=` (bulk inserts) or the POST
    * body (DDL / normalize); `EXISTS TABLE` answers 0/1 for the resync
    * swap. Errors → HTTP 500 with the message (what a real CH does),
    * so the engine's failure surfacing is exercised too. */
  private final class ChFixture {
    val stub = new StubWarehouse(spark, QKind.Dialect.ClickHouse)
    /** Query params of the last request (settings ride here). */
    @volatile var lastParams: Map[String, String] = Map.empty
    /** User-Agent of the last request (the client-name channel). */
    @volatile var lastUserAgent: String = ""
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    private def key(tok: String): String = tok.split('.')
      .map(_.stripPrefix("`").stripSuffix("`")).mkString(".")
    private val InsertJson =
      """(?is)INSERT INTO (\S+) FORMAT JSONEACHROW\s*""".r
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").toSeq.filter(_.nonEmpty).map { kv =>
          val p = kv.split("=", 2)
          URLDecoder.decode(p(0), "UTF-8") ->
            (if (p.length > 1) URLDecoder.decode(p(1), "UTF-8") else "")
        }.toMap
      lastParams = params
      lastUserAgent =
        Option(ex.getRequestHeaders.getFirst("User-Agent")).getOrElse("")
      val query = params.getOrElse("query", body)
      val result =
        try {
          val flat = query.replaceAll("\\s+", " ").trim
          flat match {
            case InsertJson(t) =>
              stub.insertJson(key(t),
                body.split("\n").toSeq.filter(_.nonEmpty))
              Right("")
            case f if f.toUpperCase.startsWith("EXISTS TABLE ") =>
              Right(if (stub.exists(key(
                f.substring("EXISTS TABLE ".length).trim))) "1\n"
              else "0\n")
            case _ => stub.execute(query); Right("")
          }
        } catch {
          case e: Throwable =>
            Left(Option(e.getMessage).getOrElse(e.toString))
        }
      val (code, text) = result match {
        case Right(ok) => (200, ok)
        case Left(err) => (500, s"Code: 62. DB::Exception: $err")
      }
      val b = text.getBytes(UTF_8)
      ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length.toLong)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def url: String = s"clickhouse://127.0.0.1:$port/db"
    def stop(): Unit = server.stop(0)
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType),
    StructField("t", StringType)))

  private def rec(cp: Long, rt: Int, data: String,
      matchData: String = null,
      toast: Seq[String] = Nil): ChangeRecord =
    ChangeRecord(rt, cp, cp.toString, cp * 1000, cp / 10, "public.t",
      "docs", data, matchData, toast)

  /** (id, v, t) rows of the CH destination, tombstones dropped by the
    * RMT(version, is_deleted) read, ordered by id. */
  private def chRows(ch: ChFixture,
      table: String = "docs"): Seq[(Long, Long, String)] =
    ch.stub.table(table).select("id", "v", "t").orderBy("id")
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2)))

  test("clickhouse:// mirror e2e over HTTP: inserts land via raw ship " +
    "+ JSONExtract normalize; cross-batch TOAST backfills; a delete " +
    "tombstones; a PK update kills the old key at version-1; the " +
    "final state equals the native MergeWriter on the same change set") {
    val ch = new ChFixture
    try {
      val wal = tmpDir("ch_wal")
      val base = tmpDir("ch_mirror")
      val bigToast = "x" * 8192
      def cfg(ck: String = s"$base/ckpt") = MirrorConfig(
        walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
        checkpointDir = ck, pkColumns = Seq("id"),
        payloadSchema = schema, destinationTable = "docs",
        warehouseUrl = Some(ch.url))

      ChangeLogWal.append(wal, Seq(
        rec(10, ChangeRecord.TypeInsert,
          s"""{"id":1,"v":10,"t":"$bigToast"}"""),
        rec(11, ChangeRecord.TypeInsert, """{"id":2,"v":20,"t":"two"}"""),
        rec(12, ChangeRecord.TypeInsert,
          """{"id":3,"v":30,"t":"three"}""")))
      new MirrorRunner(spark, cfg()).runAvailableNow()
      assert(chRows(ch) == Seq((1L, 10L, bigToast), (2L, 20L, "two"),
        (3L, 30L, "three")))
      // the emitted statements are the reference's shapes
      val stmts = ch.stub.statements.mkString("\n")
      assert(stmts.contains("ENGINE = ReplacingMergeTree"))
      assert(stmts.contains("intDiv(_peerdb_record_type, 2)"))
      assert(stmts.contains("JSONExtract(_peerdb_data,"))
      assert(stmts.contains("_peerdb_destination_table_name = 'docs'"))

      // wave 2: TOAST update (t ABSENT — the value lives only in the
      // PRIOR batch, so the source-side backfill must resolve it from
      // raw history, cdc.go:850-880's cache role), a delete, and a
      // PK-changing update 3→4
      ChangeLogWal.append(wal, Seq(
        rec(20, ChangeRecord.TypeUpdate, """{"id":1,"v":11}""",
          toast = Seq("t")),
        rec(21, ChangeRecord.TypeDelete, """{"id":2,"v":20,"t":"two"}""",
          matchData = """{"id":2,"v":20,"t":"two"}"""),
        rec(22, ChangeRecord.TypeUpdate,
          """{"id":4,"v":30,"t":"three"}""",
          matchData = """{"id":3,"v":30,"t":"three"}""")))
      new MirrorRunner(spark, cfg()).runAvailableNow()
      assert(chRows(ch) == Seq((1L, 11L, bigToast), (4L, 30L, "three")),
        "TOAST backfill / delete / PK-update must all converge")

      // equality oracle: the SAME WAL through the native MergeWriter
      val local = MirrorConfig(
        walDir = wal, rawDir = s"$base/raw2", destDir = s"$base/dest2",
        checkpointDir = s"$base/ckpt2", pkColumns = Seq("id"),
        payloadSchema = schema, destinationTable = "docs")
      val lr = new MirrorRunner(spark, local)
      lr.runAvailableNow()
      val native = lr.destination().select("id", "v", "t").orderBy("id")
        .collect().toSeq.map(r =>
          (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(chRows(ch) == native,
        "CH destination must equal the native MergeWriter state")

      // replay convergence: a REBUILT mirror (fresh checkpoint) replays
      // the full WAL — raw rows duplicate byte-identically and the RMT
      // collapse converges to the same state (the reference's
      // at-least-once posture)
      new MirrorRunner(spark, cfg(s"$base/ckpt_replay"))
        .runAvailableNow()
      assert(chRows(ch) == native, "replayed batches must converge")

      // schema evolution mid-stream: RelationRecord widens, the CH
      // table gains the column (ADD COLUMN IF NOT EXISTS,
      // cdc.go:228-329), and rows before/after the delta read back
      // NULL / value
      val deltaJson = graft.cdc.SchemaEvolution.deltaToJson(
        graft.cdc.TableSchemaDelta("public.t", "docs",
          Seq(graft.cdc.AddedColumn("extra", QKind.QString))))
      ChangeLogWal.append(wal, Seq(
        ChangeRecord(ChangeRecord.TypeRelation, 30, "30", 30000, 3,
          "public.t", "docs", deltaJson, null, Nil),
        rec(31, ChangeRecord.TypeInsert,
          """{"id":5,"v":50,"t":"five","extra":"E"}""")))
      new MirrorRunner(spark, cfg()).runAvailableNow()
      val withExtra = ch.stub.table("docs")
        .select("id", "extra").orderBy("id").collect().toSeq
        .map(r => (r.getLong(0), r.getString(1)))
      assert(withExtra == Seq((1L, null), (4L, null), (5L, "E")),
        s"ADD COLUMN must widen the CH table: $withExtra")
    } finally ch.stop()
  }

  test("clickhouse:// RESYNC: the rebuild lands in _peerdb_resync " +
    "while the original serves, then EXCHANGE TABLES swaps atomically " +
    "(RenameTables, cdc.go:331-426) — drift corrects and no resync " +
    "leftovers remain") {
    val ch = new ChFixture
    try {
      val base = tmpDir("ch_resync")
      def run(sql: String) = graft.mirror.GraftSql.execute(spark,
        graft.mirror.GraftSql.parse(sql)
          .getOrElse(fail(s"did not parse: $sql")))
      run(s"""CREATE MIRROR chmir WITH (
         |  wal_dir '$base/wal', dest_dir '$base/dest',
         |  checkpoint_dir '$base/ckpt', pk 'id',
         |  table 'docs', schema 'id BIGINT, v BIGINT, t STRING',
         |  warehouse_url '${ch.url}')""".stripMargin)
      ChangeLogWal.append(s"$base/wal", Seq(
        rec(10, ChangeRecord.TypeInsert, """{"id":1,"v":1,"t":"a"}"""),
        rec(11, ChangeRecord.TypeInsert, """{"id":2,"v":2,"t":"b"}""")))
      run("EXECUTE MIRROR chmir")
      assert(chRows(ch) == Seq((1L, 1L, "a"), (2L, 2L, "b")))

      // destination drift: corrupt a value directly on CH
      ch.stub.execute("DELETE FROM `docs` WHERE `id` = 1")
      assert(chRows(ch) == Seq((2L, 2L, "b")))

      run("RESYNC MIRROR chmir")
      assert(chRows(ch) == Seq((1L, 1L, "a"), (2L, 2L, "b")),
        "resync must rebuild the drifted destination")
      assert(!ch.stub.exists("docs_peerdb_resync"),
        "no _peerdb_resync leftovers after the swap")

      // the stream keeps converging on the swapped table
      ChangeLogWal.append(s"$base/wal", Seq(
        rec(20, ChangeRecord.TypeUpdate, """{"id":2,"v":22,"t":"b2"}""")))
      run("EXECUTE MIRROR chmir")
      assert(chRows(ch) == Seq((1L, 1L, "a"), (2L, 22L, "b2")))

      // VALIDATE probes the warehouse endpoint like capture endpoints
      val v = run("VALIDATE MIRROR chmir")
      val we = v.find(_.getString(0) == "warehouse_endpoint").get
      assert(we.getString(1) == "valid" &&
        we.getString(2).contains("clickhouse://"), we.toString)
      // an unreachable warehouse reports invalid, never hangs
      run(s"""CREATE MIRROR chdead WITH (
         |  wal_dir '$base/wal', dest_dir '$base/dest2',
         |  checkpoint_dir '$base/ckpt2', pk 'id',
         |  table 'docs', schema 'id BIGINT, v BIGINT, t STRING',
         |  warehouse_url 'clickhouse://127.0.0.1:1/db?connect_timeout_ms=300')"""
        .stripMargin)
      val vd = run("VALIDATE MIRROR chdead")
        .find(_.getString(0) == "warehouse_endpoint").get
      assert(vd.getString(1) == "invalid", vd.toString)
      run("DROP MIRROR chdead")
      run("DROP MIRROR chmir")
    } finally ch.stop()
  }

  test("multi-table clickhouse:// mirror: one CH raw table fans out " +
    "to per-table normalize ranges (the _peerdb_destination_table_name " +
    "scoping); both destinations converge independently") {
    val ch = new ChFixture
    try {
      val wal = tmpDir("ch_wal_mt")
      val base = tmpDir("ch_mirror_mt")
      def rec2(cp: Long, rt: Int, dest: String, data: String,
          matchData: String = null): ChangeRecord =
        ChangeRecord(rt, cp, cp.toString, cp * 1000, cp / 10,
          s"public.$dest", dest, data, matchData, Nil)
      ChangeLogWal.append(wal, Seq(
        rec2(10, ChangeRecord.TypeInsert, "t_a",
          """{"id":1,"v":10,"t":"a1"}"""),
        rec2(11, ChangeRecord.TypeInsert, "t_b",
          """{"k":7,"s":"seven"}"""),
        rec2(12, ChangeRecord.TypeUpdate, "t_a",
          """{"id":1,"v":11,"t":"a1"}"""),
        rec2(13, ChangeRecord.TypeDelete, "t_b",
          """{"k":7,"s":"seven"}""", matchData = """{"k":7}""")))
      val cfg = MirrorConfig(
        walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
        checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
        payloadSchema = schema, destinationTable = "t_a",
        extraTables = Map("t_b" -> graft.mirror.TableConfig(Seq("k"),
          StructType(Seq(StructField("k", LongType),
            StructField("s", StringType))))),
        warehouseUrl = Some(ch.url))
      // PEERDB_CLICKHOUSE_PARALLEL_NORMALIZE: the two tables'
      // INSERT…SELECTs run concurrently — results identical
      spark.conf.set("spark.graft.clickhouse.parallel_normalize", "2")
      try new MirrorRunner(spark, cfg).runAvailableNow()
      finally spark.conf.unset(
        "spark.graft.clickhouse.parallel_normalize")
      assert(chRows(ch, "t_a") == Seq((1L, 11L, "a1")))
      // t_b: the single key was deleted — RMT read drops the tombstone
      assert(ch.stub.table("t_b").count() == 0,
        "the deleted key must tombstone away")
      // the raw table scopes rows per destination, both tables in one
      // (flow name defaults to the primary table)
      val raw = ch.stub.table("_peerdb_raw_t_a")
      assert(raw.select("_peerdb_destination_table_name")
        .distinct().collect().map(_.getString(0)).toSet ==
        Set("t_a", "t_b"))
    } finally ch.stop()
  }

  test("QRep dest_url 'clickhouse://': append rounds bulk-load the " +
    "destination over JSONEachRow; upsert rides the RMT INSERT SELECT " +
    "loop (replays collapse by the watermark version); overwrite " +
    "full-refreshes via TRUNCATE — the reference's CH QRep pairing " +
    "(clickhouse/qrep.go) on the public HTTP surface") {
    val ch = new ChFixture
    try {
      import spark.implicits._
      val base = tmpDir("ch_qrep")
      def writeSrc(rows: Seq[(Long, Long)]): Unit =
        rows.toDF("id", "v").write
          .mode("overwrite").parquet(s"$base/src/src_t.parquet")
      writeSrc((1L to 50L).map(i => i -> (i * 10)))
      def run(sql: String) = graft.mirror.GraftSql.execute(spark,
        graft.mirror.GraftSql.parse(sql)
          .getOrElse(fail(s"did not parse: $sql")))
      run(s"CREATE PEER chsrc TYPE parquet OPTIONS (dir '$base/src')")
      run(s"CREATE PEER chdst TYPE parquet OPTIONS (dir '$base/dst')")

      // APPEND: incremental rounds land in the CH table
      run(s"""CREATE MIRROR chq1 FROM chsrc TO chdst FOR
         |$$$$ SELECT id, v FROM src_t
         |WHERE id BETWEEN {{.start}} AND {{.end}} $$$$ WITH (
         |  watermark_column 'id', source_table 'src_t',
         |  dest_dir '$base/q1', mode 'append',
         |  dest_url '${ch.url}', dest_table 'q1_dest')"""
        .stripMargin)
      assert(run("EXECUTE MIRROR chq1").head.getLong(0) == 50L)
      assert(ch.stub.table("q1_dest").count() == 50)
      writeSrc((1L to 70L).map(i => i -> (i * 10)))
      assert(run("EXECUTE MIRROR chq1").head.getLong(0) == 20L,
        "second round moves only the increment")
      assert(ch.stub.table("q1_dest").count() == 70)
      assert(ch.stub.table("q1_dest").agg(
        org.apache.spark.sql.functions.sum("v")).head.getLong(0) ==
        (1L to 70L).map(_ * 10).sum)

      // UPSERT: version = watermark; a replayed round is a no-op on
      // the RMT collapse
      run(s"""CREATE MIRROR chq2 FROM chsrc TO chdst FOR
         |$$$$ SELECT id, v FROM src_t
         |WHERE id BETWEEN {{.start}} AND {{.end}} $$$$ WITH (
         |  watermark_column 'id', source_table 'src_t',
         |  dest_dir '$base/q2', mode 'upsert', unique_key 'id',
         |  dest_url '${ch.url}', dest_table 'q2_dest')"""
        .stripMargin)
      run("EXECUTE MIRROR chq2")
      assert(ch.stub.table("q2_dest").count() == 70)
      // stale replay: wipe the watermark → full re-pull; same versions
      // collapse to the same state
      graft.util.FsText.write(s"$base/q2/_graft_wmark", "0",
        spark.sparkContext.hadoopConfiguration)
      run("EXECUTE MIRROR chq2")
      assert(ch.stub.table("q2_dest").count() == 70,
        "replayed rounds must collapse on the RMT version")

      // OVERWRITE: a shrunken source replaces the destination
      run(s"""CREATE MIRROR chq3 FROM chsrc TO chdst FOR
         |$$$$ SELECT id, v FROM src_t
         |WHERE id BETWEEN {{.start}} AND {{.end}} $$$$ WITH (
         |  watermark_column 'id', source_table 'src_t',
         |  dest_dir '$base/q3', mode 'overwrite',
         |  dest_url '${ch.url}', dest_table 'q3_dest')"""
        .stripMargin)
      run("EXECUTE MIRROR chq3")
      assert(ch.stub.table("q3_dest").count() == 70)
      writeSrc((1L to 30L).map(i => i -> (i * 10)))
      run("EXECUTE MIRROR chq3")
      assert(ch.stub.table("q3_dest").count() == 30,
        "overwrite must TRUNCATE before the reload")
      assert(ch.stub.statements.exists(_.startsWith(
        "TRUNCATE TABLE `q3_dest`")))

      // OVERWRITE + dst_table_full_resync: the refresh fills
      // q4_dest_peerdb_resync aside and EXCHANGE TABLES swaps —
      // q4_dest is never truncated mid-load (qrep_flow.go:365-400)
      writeSrc((1L to 40L).map(i => i -> (i * 10)))
      run(s"""CREATE MIRROR chq4 FROM chsrc TO chdst FOR
         |$$$$ SELECT id, v FROM src_t
         |WHERE id BETWEEN {{.start}} AND {{.end}} $$$$ WITH (
         |  watermark_column 'id', source_table 'src_t',
         |  dest_dir '$base/q4', mode 'overwrite',
         |  dst_table_full_resync 'true',
         |  dest_url '${ch.url}', dest_table 'q4_dest')"""
        .stripMargin)
      run("EXECUTE MIRROR chq4")
      assert(ch.stub.table("q4_dest").count() == 40)
      writeSrc((1L to 25L).map(i => i -> (i * 10)))
      run("EXECUTE MIRROR chq4")
      assert(ch.stub.table("q4_dest").count() == 25)
      assert(ch.stub.statements.exists(_.startsWith(
        "EXCHANGE TABLES `q4_dest` AND `q4_dest_peerdb_resync`")),
        "the swap must be the EXCHANGE TABLES verb")
      assert(!ch.stub.statements.exists(_.startsWith(
        "TRUNCATE TABLE `q4_dest`")),
        "the destination itself is never truncated")
      assert(ch.stub.statements.exists(_.startsWith(
        "DROP TABLE IF EXISTS `q4_dest_peerdb_resync`")),
        "the aside table drops after the swap")

      Seq("chq1", "chq2", "chq3", "chq4").foreach(n =>
        run(s"DROP MIRROR $n"))
      run("DROP PEER chsrc"); run("DROP PEER chdst")
    } finally ch.stop()
  }

  test("generated CH statements: raw DDL carries the cdc.go column " +
    "set and ORDER BY; normalize emits the primary-update UNION " +
    "branch at version-1; a failing statement surfaces as an HTTP " +
    "error with the server text") {
    val raw = ClickHouseSql.createRawTable(
      ClickHouseSql.rawTableName("my flow!"))
    assert(raw.contains("`_peerdb_raw_my_flow_`"))
    Seq(RawTable.Uid, RawTable.Timestamp, RawTable.DestinationTable,
      RawTable.Data, RawTable.RecordType, RawTable.MatchData,
      RawTable.BatchId, RawTable.UnchangedToastColumns)
      .foreach(c => assert(raw.contains(c), s"raw DDL must carry $c"))
    assert(raw.contains(
      "ORDER BY (_peerdb_batch_id, _peerdb_destination_table_name)"))

    val q = ClickHouseSql.normalizeQuery("docs", schema, Seq("id"),
      "_peerdb_raw_f", lastNormBatchId = 3, endBatchId = 7)
    assert(q.contains("_peerdb_batch_id > 3 AND _peerdb_batch_id <= 7"))
    assert(q.contains("UNION ALL"))
    assert(q.contains("_peerdb_timestamp - 1 AS `_peerdb_version`"))
    assert(q.contains("_peerdb_match_data != ''"))
    assert(q.contains("_peerdb_record_type = 1"))
    assert(q.contains("JSONExtract(_peerdb_data, 'v', 'Nullable(Int64)')"))
    assert(q.contains("JSONExtract(_peerdb_data, 'id', 'Int64')"))
    // PEERDB_CLICKHOUSE_ENABLE_PRIMARY_UPDATE off: no tombstone branch
    val qOff = ClickHouseSql.normalizeQuery("docs", schema, Seq("id"),
      "_peerdb_raw_f", lastNormBatchId = 3, endBatchId = 7,
      enablePrimaryUpdate = false)
    assert(!qOff.contains("UNION ALL"),
      "primary-update off must not emit the old-key tombstone branch")

    val ch = new ChFixture
    try {
      val http = new ClickHouseHttp(ch.url)
      val e = intercept[java.io.IOException] {
        http.exec("SELECT FROM nowhere") // unparseable → stub throws
      }
      assert(e.getMessage.contains("HTTP 500") &&
        e.getMessage.contains("DB::Exception"), e.getMessage)
    } finally ch.stop()
  }

  test("capture-convention delete (data NULL, old image in matchData) " +
    "tombstones the RIGHT key on clickhouse://: the ship folds the " +
    "match image into _peerdb_data (the reference stores " +
    "DeleteRecord.Items in the data slot) — without the fold the " +
    "normalize extracts the key from '' and tombstones id 0") {
    val ch = new ChFixture
    try {
      val wal = tmpDir("ch_wal_del")
      val base = tmpDir("ch_mirror_del")
      val cfg = MirrorConfig(
        walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
        checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
        payloadSchema = schema, destinationTable = "docs",
        warehouseUrl = Some(ch.url))
      ChangeLogWal.append(wal, Seq(
        rec(10, ChangeRecord.TypeInsert, """{"id":1,"v":10,"t":"a"}"""),
        rec(11, ChangeRecord.TypeInsert, """{"id":2,"v":20,"t":"b"}"""),
        // pgoutput/binlog delete shape: data null, key in matchData
        rec(12, ChangeRecord.TypeDelete, null,
          matchData = """{"id":2}""")))
      // PEERDB_CLICKHOUSE_MAX_INSERT_THREADS rides every statement
      // as a query-param setting (clickhouse.go:222-226);
      // PEERDB_CLICKHOUSE_CLIENT_NAME rides the User-Agent
      spark.conf.set("spark.graft.clickhouse.max_insert_threads", "3")
      spark.conf.set("spark.graft.clickhouse.client_name", "graft-ua")
      try new MirrorRunner(spark, cfg).runAvailableNow()
      finally {
        spark.conf.unset("spark.graft.clickhouse.max_insert_threads")
        spark.conf.unset("spark.graft.clickhouse.client_name")
      }
      assert(ch.lastParams.get("max_insert_threads").contains("3"),
        ch.lastParams.toString)
      assert(ch.lastUserAgent == "graft-ua", ch.lastUserAgent)
      assert(chRows(ch) == Seq((1L, 10L, "a")),
        "id 2 must tombstone away; id 1 must survive")
    } finally ch.stop()
  }

  test("BYTES on clickhouse://: snapshot and stream land ONE " +
    "representation — the snapshot routes through a staging copy " +
    "with the same base64Decode the normalize applies (a direct " +
    "JSONEachRow insert would store base64 TEXT beside the stream's " +
    "raw bytes); clickhouse.binary_format 'hex'/'base64' switch " +
    "both paths together (PEERDB_CLICKHOUSE_BINARY_FORMAT)") {
    val binSchema = StructType(Seq(
      StructField("id", LongType), StructField("b", BinaryType)))
    def runCase(fmt: Option[String],
        expect: String => String): Unit = {
      val ch = new ChFixture
      try {
        val wal = tmpDir(s"ch_wal_bin${fmt.getOrElse("raw")}")
        val base = tmpDir(s"ch_mirror_bin${fmt.getOrElse("raw")}")
        val cfg = MirrorConfig(
          walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
          checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
          payloadSchema = binSchema, destinationTable = "docs",
          warehouseUrl = Some(ch.url))
        fmt.foreach(f => spark.conf.set(
          "spark.graft.clickhouse.binary_format", f))
        try {
          val runner = new MirrorRunner(spark, cfg)
          // snapshot row: bytes arrive typed
          import spark.implicits._
          runner.bootstrapSnapshot(Seq(
            (1L, "snapbytes".getBytes("UTF-8"))).toDF("id", "b"))
          // stream row: bytes ride the change JSON as base64
          val b64 = java.util.Base64.getEncoder
            .encodeToString("streambytes".getBytes("UTF-8"))
          ChangeLogWal.append(wal, Seq(rec(20, ChangeRecord.TypeInsert,
            s"""{"id":2,"b":"$b64"}""")))
          runner.runAvailableNow()
        } finally fmt.foreach(_ => spark.conf.unset(
          "spark.graft.clickhouse.binary_format"))
        val rows = ch.stub.table("docs").select("id", "b").orderBy("id")
          .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
        assert(rows == Seq(
          1L -> expect("snapbytes"), 2L -> expect("streambytes")),
          s"fmt=$fmt got $rows")
      } finally ch.stop()
    }
    runCase(None, identity) // raw: decoded bytes both paths
    runCase(Some("hex"), s => s.getBytes("UTF-8")
      .map("%02X".format(_)).mkString)
    runCase(Some("base64"), s => java.util.Base64.getEncoder
      .encodeToString(s.getBytes("UTF-8")))
    // unknown format: loud
    val e = intercept[IllegalArgumentException] {
      ClickHouseSql.binExpr("bogus", "x")
    }
    assert(e.getMessage.contains("binary_format"), e.getMessage)
  }

  test("source_schema_as_destination_column on clickhouse://: the " +
    "dest DDL gains LowCardinality(String) PREPENDED to ORDER BY " +
    "(normalize.go:35,250), the normalize projection extracts the " +
    "embedded key (normalize_query.go:130-134), and two source " +
    "schemas sharing a pk stay distinct rows") {
    val ch = new ChFixture
    try {
      val wal = tmpDir("ch_wal_ss")
      val base = tmpDir("ch_mirror_ss")
      def srcRec(cp: Long, src: String, rt: Int, data: String,
          matchData: String = null): ChangeRecord =
        ChangeRecord(rt, cp, cp.toString, cp * 1000, cp, src, "docs",
          data, matchData, Nil)
      val cfg = MirrorConfig(
        walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
        checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
        payloadSchema = schema, destinationTable = "docs",
        warehouseUrl = Some(ch.url))
      ChangeLogWal.append(wal, Seq(
        srcRec(10, "sales.t", ChangeRecord.TypeInsert,
          """{"id":1,"v":1,"t":"S"}"""),
        srcRec(11, "ops.t", ChangeRecord.TypeInsert,
          """{"id":1,"v":2,"t":"O"}"""),
        // delete in sales only — ops' id=1 must stand (key includes
        // the schema column via the ORDER BY prepend)
        srcRec(12, "sales.t", ChangeRecord.TypeDelete, null,
          matchData = """{"id":1}""")))
      spark.conf.set(
        "spark.graft.mirror.source_schema_as_destination_column", "true")
      try new MirrorRunner(spark, cfg).runAvailableNow()
      finally spark.conf.unset(
        "spark.graft.mirror.source_schema_as_destination_column")
      val rows = ch.stub.table("docs")
        .select("_peerdb_source_schema", "id", "v", "t")
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getString(3)))
      assert(rows == Seq(("ops", 1L, 2L, "O")), rows.toString)
      val stmts = ch.stub.statements.mkString("\n")
      assert(stmts.contains("`_peerdb_source_schema` " +
        "LowCardinality(String)"), "dest DDL column type")
      assert(stmts.contains("ORDER BY (`_peerdb_source_schema`, `id`)"),
        "ORDER BY must PREPEND the schema column")
      assert(stmts.contains(
        "JSONExtractString(_peerdb_data, '_peerdb_source_schema') " +
          "AS `_peerdb_source_schema`"), "normalize projection fragment")
    } finally ch.stop()
  }
}
