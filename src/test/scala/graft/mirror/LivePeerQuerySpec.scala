package graft.mirror

import java.net.{InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession

import graft.SparkSpec
import graft.cdc.{StockPostgres, WireServers}
import graft.cdc.WireServers.{MysqlAnswer, MysqlCol}
import graft.qrep.MysqlClient
import graft.server.{PgClient, PgServer}

/** Interactive SELECT against LIVE (non-parquet) peers — the nexus
  * proxy's peer read path (nexus/query-router/src/lib.rs:118-164,
  * peer-postgres/src/stream.rs, peer-mysql, peer-snowflake,
  * peer-bigquery): a `peer.table` relation in plain SQL pulls through
  * the engine's own wire clients, composes with local relations in
  * one Catalyst plan, and drives cursors through the pgwire
  * front-end. PG runs against stock PostgreSQL 15; MySQL against the
  * protocol-41 fixture; the warehouses against SQL-API wire stubs
  * serving the documented REST rowset encodings. */
class LivePeerQuerySpec extends SparkSpec {

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

  private def withGraftSession[A](f: SparkSession => A): A = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  private def run(s: SparkSession, sql: String) = GraftSql.execute(s,
    GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))

  test("pg:// peer: plain SELECT routes to the live server and " +
    "equals a direct read; WHERE and NULLs decode through the OID " +
    "path; 3-part peer.schema.table resolves; a live × parquet-peer " +
    "join composes in one plan; query_partitions slices the pull") {
    val pg = srv
    pg.psql("CREATE TABLE public.lp1 (" +
      "id bigint PRIMARY KEY, v text, wm bigint)")
    pg.psql("INSERT INTO public.lp1 " +
      "SELECT g, 'v-' || g, g * 2 FROM generate_series(1, 5000) g")
    pg.psql("INSERT INTO public.lp1 VALUES (5001, NULL, NULL)")
    try withGraftSession { s =>
      run(s, "CREATE PEER lpg TYPE postgres OPTIONS (url " +
        s"'pg://postgres@127.0.0.1:${pg.port}/postgres', " +
        "query_partitions '3')")
      run(s, "CREATE PEER tp TYPE parquet OPTIONS " +
        "(path '/root/testdata/sf0.001')")
      try {
        assert(s.sql("SELECT count(*) AS c FROM lpg.lp1")
          .head().getLong(0) == 5001L)
        val f = s.sql("SELECT id, v FROM lpg.lp1 WHERE id > 4998 " +
          "ORDER BY id").collect()
        assert(f.map(r => (r.getLong(0), Option(r.getString(1))))
          .toSeq == Seq((4999L, Some("v-4999")),
            (5000L, Some("v-5000")), (5001L, None)))
        // the proxy's 3-part qualified form
        assert(s.sql("SELECT count(*) AS c FROM lpg.public.lp1")
          .head().getLong(0) == 5001L)
        // live × parquet-peer join in ONE Catalyst plan
        val j = s.sql(
          """SELECT r.r_name, count(*) AS n
            |FROM tp.region r JOIN lpg.lp1 l
            |  ON (l.id % 5) = r.r_regionkey
            |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin)
          .collect()
        assert(j.length == 5 && j.map(_.getLong(1)).sum == 5001L)
        // sliced pull: the relation is partitioned, not one task
        val df = PeerQueryRouter.query(s, "SELECT id FROM lpg.lp1")
        assert(df.rdd.getNumPartitions >= 2,
          s"expected a sliced live scan, got " +
            s"${df.rdd.getNumPartitions} partition(s)")
        assert(df.count() == 5001L)
        // GetAllTables / GetColumns against the LIVE peer (the
        // route-API listing answers from the server's catalog and
        // the schema probe — no rows move)
        val tables = run(s, "SHOW TABLES IN PEER lpg")
          .map(_.getString(0))
        assert(tables.contains("public.lp1"), s"got $tables")
        val cols = run(s, "DESCRIBE PEER lpg.lp1")
          .map(r => (r.getString(0), r.getString(1)))
        assert(cols == Seq(("id", "BIGINT"), ("v", "STRING"),
          ("wm", "BIGINT")), s"got $cols")
        // ValidatePeer on a live peer = a real connect + statement
        // round-trip (ConnectionActive); a dead endpoint reports
        // invalid with the reason, never throws
        val v = run(s, "VALIDATE PEER lpg").head
        assert(v.getString(1) == "valid" &&
          v.getString(2).contains("connected: PostgreSQL"), v.toString)
        // CREATE validates live peers by default — a dead endpoint
        // only enters the catalog with disable_validation (the
        // CreatePeerRequest escape hatch)
        run(s, "CREATE PEER lpdead TYPE postgres OPTIONS (url " +
          "'pg://postgres@127.0.0.1:1/postgres?connect_timeout_ms=300'" +
          ", disable_validation 'true')")
        try {
          val dead = run(s, "VALIDATE PEER lpdead").head
          assert(dead.getString(1) == "invalid", dead.toString)
        } finally run(s, "DROP PEER lpdead")
      } finally {
        run(s, "DROP PEER lpg"); run(s, "DROP PEER tp")
      }
    } finally pg.psql("DROP TABLE public.lp1")
  }

  test("cursor over a live pg:// peer through the pgwire front-end: " +
    "DECLARE / FETCH pages / CLOSE (nexus/peer-cursor semantics on " +
    "the live route)") {
    val pg = srv
    pg.psql("CREATE TABLE public.lpc (id bigint PRIMARY KEY)")
    pg.psql("INSERT INTO public.lpc " +
      "SELECT g FROM generate_series(0, 99) g")
    try withGraftSession { s =>
      val front = new PgServer(s).start()
      try {
        val c = new PgClient("127.0.0.1", front.port).connect()
        try {
          c.query("CREATE PEER lpc TYPE postgres OPTIONS (url " +
            s"'pg://postgres@127.0.0.1:${pg.port}/postgres')")
          c.query("DECLARE lcur CURSOR FOR " +
            "SELECT id FROM lpc.lpc ORDER BY id")
          val p1 = c.query("FETCH 40 FROM lcur")
          assert(p1.rows.size == 40 && p1.rows.head.head.contains("0"))
          val p2 = c.query("FETCH ALL FROM lcur")
          assert(p2.rows.size == 60)
          assert(p2.rows.last.head.contains("99"))
          c.query("CLOSE lcur")
          // prepared statements over the live route (the proxy's
          // text substitution re-enters the router)
          c.query("PREPARE plive AS SELECT count(*) AS n " +
            "FROM lpc.lpc WHERE id < $1")
          assert(c.query("EXECUTE plive (40)")
            .rows.head.head.contains("40"))
          assert(c.query("EXECUTE plive (100)")
            .rows.head.head.contains("100"))
          c.query("DROP PEER lpc")
        } finally c.close()
      } finally front.stop()
    } finally pg.psql("DROP TABLE public.lpc")
  }

  test("mysql:// peer: SELECT streams the peer's resultset through " +
    "the wire client (peer-mysql's single-connection stream)") {
    val listener = new ServerSocket(0)
    val cols = Seq(
      MysqlCol("id", MysqlClient.TypeLongLong),
      MysqlCol("name", 0xFD)) // VAR_STRING
    val rows = (1L to 7L).map(i =>
      Seq(Some(i.toString), Some(s"n-$i")))
    WireServers.serveMysqlQuery(listener, "pw", { sql =>
      if (sql.contains("VERSION()")) // the CREATE-time validation probe
        MysqlAnswer(Seq(MysqlCol("v", 0xFD)),
          Seq(Seq(Some("8.0.36-fixture"))))
      else if (sql.contains("LIMIT 0")) MysqlAnswer(cols, Nil)
      else if (sql.contains("FROM `items`")) MysqlAnswer(cols, rows)
      else WireServers.MysqlOk
    })
    try withGraftSession { s =>
      run(s, "CREATE PEER lmy TYPE mysql OPTIONS (url " +
        s"'mysql://root:pw@127.0.0.1:${listener.getLocalPort}/db')")
      try {
        val got = s.sql(
          "SELECT id, name FROM lmy.items ORDER BY id").collect()
        assert(got.length == 7)
        assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
          (1L to 7L).map(i => (i, s"n-$i")))
      } finally run(s, "DROP PEER lmy")
    } finally listener.close()
  }

  test("snowflake:// peer: SELECT runs through the SQL API v2 and " +
    "decodes the documented rowset encodings (epoch-day dates, " +
    "fractional-second timestamps, scaled fixed, booleans, NULLs); " +
    "multi-partition results page in completely; NUMBER(38,0) " +
    "beyond Long decodes as decimal") {
    val stmts = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val http = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    val rowType = """"rowType":[
      {"name":"id","type":"fixed","scale":0,"precision":18},
      {"name":"big","type":"fixed","scale":0,"precision":38},
      {"name":"amt","type":"fixed","scale":2,"precision":10},
      {"name":"x","type":"real"},
      {"name":"s","type":"text"},
      {"name":"b","type":"boolean"},
      {"name":"d","type":"date"},
      {"name":"ts","type":"timestamp_ntz"}]"""
    val meta = s""""resultSetMetaData":{$rowType,
      "partitionInfo":[{"rowCount":2},{"rowCount":1}]}"""
    val probeMeta = s""""resultSetMetaData":{$rowType}"""
    http.createContext("/api/v2/statements", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      stmts.add(ex.getRequestMethod + " " +
        ex.getRequestURI.toString + " " + body)
      // partition 1 fetch: GET /api/v2/statements/{handle}?partition=1
      val resp = (if (ex.getRequestMethod == "GET" &&
          ex.getRequestURI.getQuery == "partition=1")
        """{"data":[
          ["3","1","0.10","0.5","p1","true","19724","1.000000000"]]}"""
      else if (body.contains("LIMIT 0"))
        // a real probe response has a single (empty) partition
        s"""{"statementHandle":"h-0",$probeMeta,"data":[]}"""
      else {
        val data = """"data":[
            ["1","99999999999999999999","12.34","1.5","hi","true",
             "19723","1700000000.123456000"],
            ["2",null,null,null,null,"false",null,null]]"""
        s"""{"statementHandle":"h-123",$meta,$data}"""
      }).getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length.toLong)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    http.start()
    try withGraftSession { s =>
      // disable_validation keeps the statement counting below exact
      // (a validated CREATE adds its own SELECT 1 round-trip)
      run(s, "CREATE PEER swh TYPE snowflake OPTIONS (url " +
        s"'snowflake://127.0.0.1:${http.getAddress.getPort}/AN" +
        "?schema=PUBLIC&token=tok', disable_validation 'true')")
      try {
        val got = s.sql("SELECT id, big, amt, s, b, d, ts FROM swh.t " +
          "ORDER BY id").collect()
        assert(got.length == 3, "partition 1 rows must page in")
        val r1 = got(0)
        assert(r1.getLong(0) == 1L)
        // 20-digit NUMBER(38,0): LongType would have thrown
        assert(r1.getDecimal(1) ==
          new java.math.BigDecimal("99999999999999999999"))
        assert(r1.getDecimal(2).compareTo(
          new java.math.BigDecimal("12.34")) == 0)
        assert(r1.getString(3) == "hi" && r1.getBoolean(4))
        assert(r1.getDate(5).toLocalDate ==
          java.time.LocalDate.of(2024, 1, 1))
        assert(r1.getTimestamp(6).toInstant ==
          java.time.Instant.ofEpochSecond(1700000000L, 123456000L))
        val r2 = got(1)
        assert(r2.getLong(0) == 2L && r2.isNullAt(1) &&
          r2.isNullAt(2) && r2.isNullAt(3) && !r2.getBoolean(4) &&
          r2.isNullAt(5) && r2.isNullAt(6))
        assert(got(2).getLong(0) == 3L && got(2).getString(3) == "p1")
        // lazy: the action above ran the full SELECT exactly once,
        // after the build-time LIMIT 0 probe
        val sqls = stmts.toArray.map(_.toString).toSeq
        // one build-time schema probe; the full SELECT may execute
        // more than once (ORDER BY = range-partitioner sampling pass
        // + sort — the lazy re-read contract), and EVERY execution
        // must page partition 1 in
        assert(sqls.count(_.contains("LIMIT 0")) == 1,
          sqls.mkString("\n"))
        val fulls = sqls.count(s => s.startsWith("POST") &&
          !s.contains("LIMIT 0"))
        assert(fulls >= 1 &&
          sqls.count(_.contains("partition=1")) == fulls,
          sqls.mkString("\n"))
      } finally run(s, "DROP PEER swh")
    } finally http.stop(0)
  }

  test("bigquery:// peer: SELECT runs through jobs.query and decodes " +
    "the f/v rowset (epoch-second timestamps, ISO dates, NULL vs " +
    "value cells); pageToken pages follow to exhaustion; REPEATED " +
    "and RECORD columns keep their JSON images") {
    val http = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    val schema = """"schema":{"fields":[
      {"name":"id","type":"INTEGER"},
      {"name":"s","type":"STRING"},
      {"name":"d","type":"DATE"},
      {"name":"ts","type":"TIMESTAMP"},
      {"name":"tags","type":"INTEGER","mode":"REPEATED"},
      {"name":"rec","type":"RECORD"}]}"""
    http.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val isPage2 = ex.getRequestMethod == "GET" &&
        Option(ex.getRequestURI.getQuery).exists(_.contains(
          "pageToken=tok2"))
      val resp = (if (isPage2)
        """{"jobComplete":true,"rows":[
          {"f":[{"v":"9"},{"v":"page2"},{"v":null},{"v":null},
                {"v":[]},{"v":null}]}]}"""
      else {
        val rows =
          if (body.contains("LIMIT 0")) """"rows":[]"""
          else """"rows":[
            {"f":[{"v":"7"},{"v":"bq"},{"v":"2024-01-01"},
                  {"v":"1.7000000001234E9"},
                  {"v":[{"v":"1"},{"v":"2"}]},
                  {"v":{"f":[{"v":"x"}]}}]},
            {"f":[{"v":"8"},{"v":null},{"v":null},{"v":null},
                  {"v":[]},{"v":null}]}],
          "pageToken":"tok2" """.trim
        s"""{"jobComplete":true,
          "jobReference":{"projectId":"proj","jobId":"job-1"},
          $schema,$rows}"""
      }).getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length.toLong)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    http.start()
    try withGraftSession { s =>
      run(s, "CREATE PEER bwh TYPE bigquery OPTIONS (url " +
        s"'bigquery://127.0.0.1:${http.getAddress.getPort}/proj" +
        "?dataset=ds&token=tok')")
      try {
        val got = s.sql("SELECT id, s, d, ts, tags, rec FROM bwh.t " +
          "ORDER BY id").collect()
        assert(got.length == 3, "the pageToken page must follow")
        assert(got(0).getLong(0) == 7L && got(0).getString(1) == "bq")
        assert(got(0).getDate(2).toLocalDate ==
          java.time.LocalDate.of(2024, 1, 1))
        assert(got(0).getTimestamp(3).toInstant.getEpochSecond ==
          1700000000L)
        // REPEATED/RECORD cells: compact JSON image, not "" / crash
        assert(got(0).getString(4) == """[{"v":"1"},{"v":"2"}]""")
        assert(got(0).getString(5) == """{"f":[{"v":"x"}]}""")
        assert(got(1).getLong(0) == 8L && got(1).isNullAt(1) &&
          got(1).isNullAt(2) && got(1).isNullAt(3))
        assert(got(2).getLong(0) == 9L && got(2).getString(1) ==
          "page2")
      } finally run(s, "DROP PEER bwh")
    } finally http.stop(0)
  }
}
