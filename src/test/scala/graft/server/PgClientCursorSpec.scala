package graft.server

import java.io.{BufferedInputStream, DataInputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{PgWire, StockPostgres}

/** [[PgClient.queryCursor]] — the streaming row path live snapshot and
  * QRep partition reads ride (the reference's QRecordStream,
  * flow/connectors/postgres/qrep_query_executor.go:282-520). Pinned
  * against REAL PostgreSQL 15 for: decode parity with the
  * materializing [[PgClient.query]], session reuse after exhaustion /
  * errors / early close (cancel-then-drain), and rejection of
  * multi-statement and COPY responses with the session left synced at
  * ReadyForQuery. The O(row) memory claim is proven by a raw fixture
  * server that streams an UNBOUNDED result: a materializing client
  * could never return the first row; the cursor yields rows promptly.
  */
class PgClientCursorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: Option[StockPostgres.Server] = None
  override def beforeAll(): Unit = { server = StockPostgres.start() }
  override def afterAll(): Unit = server.foreach(_.stop())
  private def srv: StockPostgres.Server = {
    assume(server.isDefined, "stock postgres unavailable in this env")
    server.get
  }
  private def client(): PgClient = {
    val s = srv
    new PgClient("127.0.0.1", s.port, user = "postgres",
      database = "postgres").connect()
  }

  test("cursor decodes exactly what query() decodes, and the session " +
    "is reusable after exhaustion") {
    val c = client()
    try {
      val sql = "SELECT g AS id, g * 2 AS v, 'r' || g AS t, " +
        "CASE WHEN g % 5 = 0 THEN NULL ELSE g::text END AS n " +
        "FROM generate_series(1, 2345) g ORDER BY g"
      val buffered = c.query(sql)
      val cur = c.queryCursor(sql)
      assert(cur.columns == buffered.columns)
      assert(cur.typeOids.nonEmpty)
      val streamed = cur.toSeq // exhausts; session back at RFQ
      assert(streamed == buffered.rows)
      assert(cur.tag == "SELECT 2345")
      // session reusable immediately (no desync)
      assert(c.query("SELECT 42").rows == Seq(Seq(Some("42"))))
    } finally c.close()
  }

  test("a server error mid-result raises from the cursor AFTER the " +
    "drain reaches ReadyForQuery — session stays usable") {
    val c = client()
    try {
      val cur = c.queryCursor(
        "SELECT 10 / (5 - g) FROM generate_series(1, 10) g")
      val e = intercept[PgClient.PgServerError] {
        while (cur.hasNext) cur.next()
      }
      assert(e.sqlState == "22012") // division_by_zero
      assert(c.query("SELECT 7").rows == Seq(Seq(Some("7"))))
    } finally c.close()
  }

  test("early close() of a partially-read cursor cancels and drains — " +
    "the session is usable again without reading the whole result") {
    val c = client()
    try {
      val cur = c.queryCursor(
        "SELECT g, repeat('x', 100) FROM generate_series(1, 2000000) g")
      val first = (1 to 10).map(_ => cur.next())
      assert(first.head.head == Some("1"))
      val t0 = System.nanoTime()
      cur.close() // fires PQcancel, then drains whatever remains
      val closeMs = (System.nanoTime() - t0) / 1000000
      // without cancel the drain downloads ~200 MB of rows; with it
      // the server cuts the stream — keep a generous bound so a slow
      // host doesn't flake, while still catching an O(result) drain
      assert(closeMs < 30000, s"close() drained for ${closeMs}ms")
      assert(c.query("SELECT 3").rows == Seq(Seq(Some("3"))))
    } finally c.close()
  }

  test("multi-statement SQL is rejected (drained to RFQ, then " +
    "raised) instead of silently interleaving result sets") {
    val c = client()
    try {
      val cur = c.queryCursor("SELECT 1; SELECT 'a', 'b'")
      val e = intercept[java.io.IOException] {
        while (cur.hasNext) cur.next()
      }
      assert(e.getMessage.contains("multi-statement"))
      assert(c.query("SELECT 9").rows == Seq(Seq(Some("9"))))
    } finally c.close()
  }

  test("COPY TO STDOUT through the cursor is rejected with the " +
    "session synced (copy data drained)") {
    val c = client()
    try {
      // the whole exchange drains to RFQ before the error raises (no
      // rows buffered) — so it surfaces from queryCursor itself
      val e = intercept[java.io.IOException] {
        val cur = c.queryCursor(
          "COPY (SELECT g FROM generate_series(1, 100) g) TO STDOUT")
        while (cur.hasNext) cur.next()
      }
      assert(e.getMessage.contains("COPY"))
      assert(c.query("SELECT 11").rows == Seq(Seq(Some("11"))))
    } finally c.close()
  }

  test("COPY FROM STDIN through the cursor is refused via CopyFail — " +
    "no data sent, session synced") {
    val c = client()
    try {
      c.query("CREATE TABLE IF NOT EXISTS curs_copy (x int)")
      val e = intercept[java.io.IOException] {
        val cur = c.queryCursor("COPY curs_copy FROM STDIN")
        while (cur.hasNext) cur.next()
      }
      assert(e.getMessage.contains("COPY"))
      assert(c.query("SELECT count(*) FROM curs_copy").rows ==
        Seq(Seq(Some("0"))))
      c.query("DROP TABLE curs_copy")
    } finally c.close()
  }

  test("O(row) memory: rows stream off an UNBOUNDED fixture result — " +
    "a materializing client could never yield the first row") {
    // raw pgwire backend: auth-ok, then answers any Query with a
    // RowDescription and an endless stream of DataRows
    val listener = new java.net.ServerSocket(0)
    val serverThread = new Thread(() => {
      try {
        val s = listener.accept()
        val in = new DataInputStream(
          new BufferedInputStream(s.getInputStream))
        val out = s.getOutputStream
        val startupLen = in.readInt()
        in.skipBytes(startupLen - 4)
        PgWire.writeMessage(out, 'R',
          ByteBuffer.allocate(4).putInt(0).array()) // AuthenticationOk
        PgWire.writeMessage(out, 'Z', Array('I'.toByte))
        out.flush()
        PgWire.readMessage(in) // the Query
        // RowDescription: one text column "x"
        val rd = new java.io.ByteArrayOutputStream()
        rd.write(Array[Byte](0, 1))
        rd.write(PgWire.cstring("x"))
        rd.write(ByteBuffer.allocate(18).putInt(0).putShort(0)
          .putInt(25).putShort(-1).putInt(-1).putShort(0).array())
        PgWire.writeMessage(out, 'T', rd.toByteArray)
        val cell = ("y" * 1000).getBytes(UTF_8)
        val dr = ByteBuffer.allocate(2 + 4 + cell.length)
          .putShort(1).putInt(cell.length).put(cell).array()
        while (true) { PgWire.writeMessage(out, 'D', dr) } // forever
      } catch { case _: Throwable => () } // client hung up: done
      finally { try listener.close() catch { case _: Throwable => () } }
    })
    serverThread.setDaemon(true)
    serverThread.start()

    val c = new PgClient("127.0.0.1", listener.getLocalPort,
      user = "u", database = "d").connect()
    try {
      // a cursor that buffered the result first would block forever
      // here; the timeout turns that regression into a failure
      val n = Await.result(Future {
        val cur = c.queryCursor("SELECT endless")
        assert(cur.columns == Seq("x"))
        assert(cur.typeOids == Seq(25))
        cur.take(5000).count(_.head.exists(_.length == 1000))
      }, 30.seconds)
      assert(n == 5000)
    } finally c.close() // abandon the session outright (no drain)
  }
}
