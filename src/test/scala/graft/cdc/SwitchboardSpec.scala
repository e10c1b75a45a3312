package graft.cdc

import java.net.ServerSocket

import org.scalatest.funsuite.AnyFunSuite

import graft.server.{PgClient, PgClients}

/** Switchboard MySQL/Mongo upstreams: a standard pgwire client
  * (psql-shaped simple queries through [[PgClient]]) queries native
  * MySQL and MongoDB upstreams through the proxy — SQL verbatim to
  * MySQL, Extended JSON commands to Mongo, results back as pgwire
  * text rows (flow/switchboard/README.md:3: "lets standard PostgreSQL
  * clients query upstream PostgreSQL, MySQL, and MongoDB databases").
  * The PG passthrough leg is pinned separately in [[PgWireSpec]]. */
class SwitchboardSpec extends AnyFunSuite {

  private def pgc(port: Int): PgClient =
    PgClients.connect(s"pg://op@127.0.0.1:$port/db")

  test("mysql:// upstream: psql-shaped queries run VERBATIM over " +
    "COM_QUERY (native dialect included), text resultsets stream " +
    "back as pgwire rows with NULLs intact, OK packets answer " +
    "row-less, and an upstream hangup surfaces as an ErrorResponse " +
    "— not a dead session") {
    import WireServers.{MysqlAnswer, MysqlCol, MysqlOk}
    val listener = new ServerSocket(0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    WireServers.serveMysqlQuery(listener, "pw", { sql =>
      seen.add(sql)
      sql match {
        case "SELECT id, name FROM users LIMIT 2" => MysqlAnswer(
          Seq(MysqlCol("id", 0x08), MysqlCol("name", 0xFD)),
          Seq(Seq(Some("1"), Some("ann")), Seq(Some("2"), None)))
        // MySQL-only dialect passes through untranslated
        case "SHOW TABLES" => MysqlAnswer(
          Seq(MysqlCol("Tables_in_db", 0xFD)),
          Seq(Seq(Some("users")), Seq(Some("orders"))))
        case "SELECT @@GLOBAL.gtid_executed" => MysqlAnswer(
          Seq(MysqlCol("@@GLOBAL.gtid_executed", 0xFD)),
          Seq(Seq(Some("3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5"))))
        case s if s.startsWith("SET ") => MysqlOk
        case other => MysqlAnswer(Seq(MysqlCol("echo", 0xFD)),
          Seq(Seq(Some(other))))
      }
    })
    val sb = new Switchboard(
      s"mysql://root:pw@127.0.0.1:${listener.getLocalPort}/db").start()
    try {
      val c = pgc(sb.port)
      try {
        val r = c.query("SELECT id, name FROM users LIMIT 2")
        assert(r.columns == Seq("id", "name"))
        assert(r.rows == Seq(Seq(Some("1"), Some("ann")),
          Seq(Some("2"), None)), "NULL must stay NULL, not 'null'")
        assert(r.tag == "SELECT 2")

        val t = c.query("SHOW TABLES")
        assert(t.rows.flatten.flatten == Seq("users", "orders"))

        val g = c.query("SELECT @@GLOBAL.gtid_executed")
        assert(g.columns == Seq("@@GLOBAL.gtid_executed") &&
          g.rows.head.head.get.endsWith(":1-5"))

        // an OK-packet statement (no resultset) completes row-less
        val ok = c.query("SET SESSION sort_buffer_size = 1")
        assert(ok.columns.isEmpty && ok.tag == "OK")

        // the proxy added nothing and translated nothing (the first
        // two statements are MysqlClient's own session pins:
        // time_zone and sql_mode at connect)
        assert(seen.toArray.toSeq.drop(2) == Seq(
          "SELECT id, name FROM users LIMIT 2", "SHOW TABLES",
          "SELECT @@GLOBAL.gtid_executed",
          "SET SESSION sort_buffer_size = 1"), seen.toString)
      } finally c.close()

      // upstream gone mid-session: the next query gets a readable
      // error on a live session (not a hangup)
      val c2 = pgc(sb.port)
      try {
        assert(c2.query("SELECT 1").rows.head.head.get ==
          "SELECT 1") // echo branch — session works
        listener.close() // kill the upstream listener AND sessions
        sb.stop() // also closes tracked conduits
        intercept[Exception] { c2.query("SELECT 2") }
      } finally c2.close()
    } finally {
      sb.stop()
      try listener.close() catch { case _: java.io.IOException => () }
    }
  }

  test("mongodb:// upstream: Extended JSON commands ride OP_MSG — " +
    "cursor batches return one Extended JSON document per row, " +
    "non-cursor replies as a single row, $db defaults to the " +
    "endpoint database, server errors surface as ErrorResponse, " +
    "and `help` answers inline") {
    val listener = new ServerSocket(0)
    val cmds = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    WireServers.serveMongoQuery(listener, { (cmd, doc) =>
      cmds.add(cmd)
      val db = Bson.elements(doc).collectFirst {
        case ("$db", 0x02, v) => MongoWire.stringOf(v)
      }.getOrElse("")
      cmd match {
        case "find" =>
          // {"cursor":{"firstBatch":[{a:1},{a:2}],"id":0},"ok":1}
          Bson.encode(
            "cursor" -> Bson.BDoc(Seq(
              "firstBatch" -> Bson.BArray(Seq(
                Bson.BDoc(Seq("a" -> Bson.BInt32(1),
                  "tag" -> Bson.BString("x"))),
                Bson.BDoc(Seq("a" -> Bson.BInt32(2),
                  "tag" -> Bson.BNull)))),
              "id" -> Bson.BInt64(0),
              "ns" -> Bson.BString(s"$db.users"))),
            "ok" -> Bson.BDouble(1.0))
        case "ping" => Bson.encode("ok" -> Bson.BDouble(1.0))
        case "dropDatabase" => Bson.encode(
          "ok" -> Bson.BDouble(0.0),
          "errmsg" -> Bson.BString("not authorized on app"))
        case other => Bson.encode(
          "echo" -> Bson.BString(other),
          "ok" -> Bson.BDouble(1.0))
      }
    })
    val sb = new Switchboard(
      s"mongodb://127.0.0.1:${listener.getLocalPort}/app").start()
    try {
      val c = pgc(sb.port)
      try {
        val r = c.query(
          """{"find": "users", "filter": {"a": {"$gt": 0}}}""")
        assert(r.columns == Seq("result"))
        assert(r.rows.size == 2 && r.tag == "SELECT 2")
        assert(r.rows.head.head.get.contains("\"a\":1") &&
          r.rows.head.head.get.contains("\"tag\":\"x\""),
          r.rows.toString)

        val p = c.query("""{"ping": 1}""")
        assert(p.rows.size == 1 &&
          p.rows.head.head.get.contains("\"ok\""), p.toString)

        // a server-side error is a pgwire error, session stays live
        val e = intercept[Exception] {
          c.query("""{"dropDatabase": 1}""")
        }
        assert(e.getMessage.contains("not authorized"), e.getMessage)
        assert(c.query("""{"ping": 1}""").rows.size == 1,
          "the session must survive an upstream error")

        val h = c.query("help")
        assert(h.columns == Seq("help") &&
          h.rows.head.head.get.contains("Extended JSON"))

        // a non-JSON query is a readable error (no SQL translation
        // exists for mongo upstreams)
        val e2 = intercept[Exception] { c.query("SELECT 1") }
        assert(e2.getMessage.toLowerCase.contains("extended json"),
          e2.getMessage)
      } finally c.close()
      assert(cmds.toArray.toSeq ==
        Seq("find", "ping", "dropDatabase", "ping"), cmds.toString)
    } finally {
      sb.stop()
      try listener.close() catch { case _: java.io.IOException => () }
    }
  }
}
