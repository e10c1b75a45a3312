package graft.mirror

import java.net.ServerSocket

import org.apache.spark.sql.SparkSession

import graft.SparkSpec
import graft.cdc.{StockPostgres, WireServers}
import graft.cdc.WireServers.{MysqlAnswer, MysqlCol}
import graft.qrep.MysqlClient

/** `EXECUTE peer $$query$$` — the nexus ExecutePeer surface
  * (analyzer/src/lib.rs:510-541 `check_execute_peer`,
  * server/src/main.rs:412-423 → `QueryExecutor::execute_raw`): the
  * statement ships RAW to the peer in the peer's own dialect; rowset
  * statements stream rows back, commands answer the peer's tag. The
  * router checks this shape before everything else
  * (query-router/src/lib.rs:48-56), so a registered peer shadows a
  * same-named prepared statement. */
class ExecutePeerSpec extends SparkSpec {

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

  test("parquet peer: EXECUTE runs the query in the peer's OWN " +
    "namespace (unqualified names bind to the peer's tables); both " +
    "$$ and ('…') argument forms; DML rejected; EXECUTE IMMEDIATE " +
    "and prepared-name EXECUTE are not hijacked; a registered peer " +
    "shadows a same-named prepared statement (router precedence)") {
    withGraftSession { s =>
      run(s, "CREATE PEER xtp TYPE parquet OPTIONS " +
        "(path '/root/testdata/sf0.001')")
      try {
        val got = s.sql("EXECUTE xtp $$ SELECT r_name FROM region " +
          "ORDER BY r_name $$").collect().map(_.getString(0)).toSeq
        val want = s.read
          .parquet("/root/testdata/sf0.001/region.parquet")
          .select("r_name").collect().map(_.getString(0)).toSeq.sorted
        assert(got == want, s"got $got")
        // parenthesized single-quoted form, '' escape
        assert(s.sql("EXECUTE xtp ('SELECT count(*) AS c FROM " +
          "nation WHERE n_name <> ''nowhere''')")
          .head().getLong(0) == 25L)
        // parquet peers are read-only
        val e = intercept[IllegalArgumentException](
          s.sql("EXECUTE xtp $$ DELETE FROM region $$"))
        assert(e.getMessage.contains("read-only"), e.getMessage)
        // Spark's own EXECUTE IMMEDIATE passes through untouched
        assert(s.sql("EXECUTE IMMEDIATE 'SELECT 41 + 1 AS v'")
          .head().getInt(0) == 42)
        // prepared-name EXECUTE still reaches the statement cache
        s.sql("PREPARE xprep AS SELECT 'p-' || $1 AS v")
        try {
          assert(s.sql("EXECUTE xprep ('z')")
            .head().getString(0) == "p-z")
          // a name that is BOTH a peer and prepared: peer wins (the
          // proxy checks execute_peer first)
          s.sql("PREPARE xtp AS SELECT 'prepared' AS who")
          assert(s.sql("EXECUTE xtp ('SELECT count(*) AS c FROM " +
            "region')").head().getLong(0) == 5L)
        } finally {
          s.sql("DEALLOCATE xprep")
          s.sql("DEALLOCATE xtp")
        }
      } finally run(s, "DROP PEER xtp")
    }
  }

  test("pg:// peer: rowset EXECUTE ships the text raw (PG-only " +
    "syntax executes), a command EXECUTE answers the server's tag, " +
    "and a cursor DECLAREs over an EXECUTE (execute_raw's stream " +
    "contract)") {
    val pg = srv
    pg.psql("CREATE TABLE public.xep (id bigint PRIMARY KEY, v text)")
    try withGraftSession { s =>
      run(s, "CREATE PEER xpg TYPE postgres OPTIONS (url " +
        s"'pg://postgres@127.0.0.1:${pg.port}/postgres')")
      try {
        // generate_series: the text reaches PostgreSQL unparsed by
        // Spark — raw-dialect proof
        val ids = s.sql("EXECUTE xpg $$ SELECT g * 10 AS id " +
          "FROM generate_series(1, 4) g ORDER BY g $$")
          .collect().map(_.getInt(0)).toSeq
        assert(ids == Seq(10, 20, 30, 40))
        // command leg: the peer's own CommandComplete tag
        val ins = s.sql("EXECUTE xpg $$ INSERT INTO public.xep " +
          "SELECT g, 'v' || g FROM generate_series(1, 3) g $$")
          .head().getString(0)
        assert(ins == "INSERT 0 3", ins)
        assert(s.sql("EXECUTE xpg $$ SELECT count(*) AS c " +
          "FROM public.xep $$").head().getLong(0) == 3L)
        // cursor over an EXECUTE — DECLARE plans lazily, FETCH pages
        run(s, "DECLARE xc CURSOR FOR EXECUTE xpg " +
          "$$ SELECT id FROM public.xep ORDER BY id $$")
        val page = run(s, "FETCH 2 FROM xc").map(_.getLong(0))
        assert(page == Seq(1L, 2L))
        assert(run(s, "FETCH ALL FROM xc").map(_.getLong(0)) ==
          Seq(3L))
        run(s, "CLOSE xc")
      } finally run(s, "DROP PEER xpg")
    } finally pg.psql("DROP TABLE public.xep")
  }

  test("mysql:// peer: rowset EXECUTE streams the fixture's " +
    "resultset; a command EXECUTE answers OK with the affected-row " +
    "count from the OK packet") {
    val listener = new ServerSocket(0)
    val cols = Seq(MysqlCol("n", MysqlClient.TypeLongLong))
    WireServers.serveMysqlQuery(listener, "pw", { sql =>
      if (sql.contains("LIMIT 0")) MysqlAnswer(cols, Nil)
      else if (sql.contains("SELECT")) MysqlAnswer(cols,
        Seq(Seq(Some("6")), Seq(Some("7"))))
      else MysqlAnswer(Nil, Nil, affected = 5L)
    })
    try withGraftSession { s =>
      run(s, "CREATE PEER xmy TYPE mysql OPTIONS (url " +
        s"'mysql://root:pw@127.0.0.1:${listener.getLocalPort}/db')")
      try {
        assert(s.sql("EXECUTE xmy $$ SELECT n FROM t $$")
          .collect().map(_.getLong(0)).toSeq == Seq(6L, 7L))
        assert(s.sql("EXECUTE xmy $$ UPDATE t SET n = n + 1 $$")
          .head().getString(0) == "OK 5")
      } finally run(s, "DROP PEER xmy")
    } finally listener.close()
  }
}
