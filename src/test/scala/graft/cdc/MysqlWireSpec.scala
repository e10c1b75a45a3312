package graft.cdc

import java.io.{BufferedInputStream, DataInputStream}
import java.net.ServerSocket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Live MySQL replication sessions against an in-process server that
  * speaks the documented client/server protocol: handshake v10 with a
  * 20-byte scramble, `mysql_native_password` verification,
  * `COM_REGISTER_SLAVE`, `COM_BINLOG_DUMP`, then the OK-prefixed event
  * stream opened by a fake timestamp-0 Rotate (which seeds the
  * decoder's file cursor exactly as a real server does). The SAME
  * [[MysqlBinlogFiles.ingestFrom]] loop that drains capture files
  * drains the socket — [[MysqlSocketSource]] is just a
  * [[Wire.MysqlSource]]. */
class MysqlWireSpec extends AnyFunSuite {

  import MysqlWire._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val Scramble: Array[Byte] =
    Array.tabulate(20)(i => (i * 7 + 3).toByte)

  final class ServerSession {
    @volatile var username = ""
    @volatile var authOk = false
    @volatile var registered = false
    @volatile var dumpFile = ""
    @volatile var dumpPos = -1L
    @volatile var dumpFlags = -1
    @volatile var dumpServerId = -1L
  }

  /** One fixture session: greeting, auth check, command loop, event
    * stream, EOF. */
  private def serveDump(server: ServerSocket, password: String,
      events: Seq[Array[Byte]]): ServerSession = {
    val sess = new ServerSession
    val t = new Thread(() => {
      val c = server.accept()
      try {
        val in = new DataInputStream(
          new BufferedInputStream(c.getInputStream))
        val out = c.getOutputStream
        val caps = (ClientLongPassword | ClientProtocol41 |
          ClientSecureConnection | ClientPluginAuth).toLong

        // ---- greeting (handshake v10)
        writePacket(out, 0, new Wtr()
          .u8(10).cstr("8.0.36-fixture").u32(7L)
          .raw(Scramble.take(8)).u8(0)
          .u16((caps & 0xFFFF).toInt).u8(45).u16(2)
          .u16(((caps >> 16) & 0xFFFF).toInt)
          .u8(21).zeros(10)
          .raw(Scramble.drop(8)).u8(0)
          .cstr(NativePassword).bytes)

        // ---- HandshakeResponse41
        val (_, resp) = readPacket(in).get
        val r = new R(resp)
        r.u32(); r.u32(); r.u8(); r.bytes(23)
        sess.username = r.cstring()
        val token = r.bytes(r.u8())
        val expected = scramble411(password, Scramble)
        if (!java.util.Arrays.equals(token, expected)) {
          writePacket(out, 2, new Wtr()
            .u8(0xFF).u16(1045).u8('#').str("28000")
            .str("Access denied for user").bytes)
        } else {
          sess.authOk = true
          writePacket(out, 2, new Wtr()
            .u8(0x00).u8(0).u8(0).u16(2).u16(0).bytes)

          // ---- command loop
          var open = true
          while (open) readPacket(in) match {
            case None => open = false
            case Some((_, p)) if p.isEmpty => ()
            case Some((_, p)) => (p(0) & 0xFF) match {
              case 0x15 => // COM_REGISTER_SLAVE
                sess.registered = true
                writePacket(out, 1, new Wtr()
                  .u8(0x00).u8(0).u8(0).u16(2).u16(0).bytes)
              case 0x12 => // COM_BINLOG_DUMP
                val d = new R(p); d.u8()
                sess.dumpPos = d.u32()
                sess.dumpFlags = d.u16()
                sess.dumpServerId = d.u32()
                sess.dumpFile = new String(d.rest(), "UTF-8")
                var seq = 1
                events.foreach { ev =>
                  writePacket(out, seq,
                    Array(0x00.toByte) ++ ev)
                  seq += 1
                }
                // EOF: caught up (non-block dump)
                writePacket(out, seq, new Wtr()
                  .u8(0xFE).u16(0).u16(2).bytes)
              case 0x01 => open = false // COM_QUIT
              case _ => ()
            }
          }
        }
      } finally c.close()
    })
    t.setDaemon(true)
    t.start()
    sess
  }

  import MysqlBinlog._
  private val tm = TableMap(5L, "app", "t",
    Array(ColType.LongLong, ColType.Varchar),
    Array(0, 255), Array(false, true),
    Seq("id", "name"), Seq(true, true))
  /** A stream for file binlog.000002 announced by a fake Rotate
    * (timestamp 0 — artificial, never advances positions). */
  private def streamEvents(id: Long, name: String): Seq[Array[Byte]] =
    Seq(
      encodeRotate(0L, 0L, 4L, "binlog.000002"),
      encodeFormatDescription(1L, 4L),
      encodeTableMap(1L, 10L, tm),
      encodeQuery(1L, 20L, "app", "BEGIN"),
      encodeRows(1L, 21L, Ev.WriteRowsV2, tm, Seq(
        Seq(Some(Some(fLong(id))), Some(Some(fVarchar(name, 255)))))),
      encodeXid(1L, 22L, id))

  test("full dump session: handshake, native-password auth, slave " +
    "registration, fake-Rotate file seeding, tx-durable ingest") {
    val server = new ServerSocket(0)
    try {
      val sess = serveDump(server, "sekret", streamEvents(1L, "a"))
      val src = new MysqlSocketSource("127.0.0.1",
        server.getLocalPort, user = "repl", password = "sekret",
        serverId = 4242L)
      val wal = tmp("mywire_wal")
      val (n, cp) = MysqlBinlogFiles.ingestFrom(src, wal)
      assert(n == 1 && cp == "binlog.000002:22")
      assert(sess.authOk && sess.username == "repl")
      assert(sess.registered)
      // default start position: file head, after the magic
      assert(sess.dumpFile == "binlog.000001" && sess.dumpPos == 4L)
      assert(sess.dumpFlags == 0x01 && sess.dumpServerId == 4242L)
      assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6)) ==
        Seq("""{"id":1,"name":"a"}"""))
    } finally server.close()
  }

  test("file:pos resume: the checkpoint is sent to the server as the " +
    "dump offset, and a full replay dedups via the tx-skip guard") {
    val server = new ServerSocket(0)
    try {
      val sess = serveDump(server, "sekret", streamEvents(1L, "a"))
      val src = new MysqlSocketSource("127.0.0.1",
        server.getLocalPort, password = "sekret")
      val wal = tmp("mywire_wal2")
      // server replays from its own head regardless (fixture), so the
      // per-transaction guard must drop the acked tx
      val (n, cp) = MysqlBinlogFiles.ingestFrom(src, wal,
        afterCheckpoint = "binlog.000002:22")
      assert(n == 0 && cp == "binlog.000002:22")
      assert(sess.dumpFile == "binlog.000002" && sess.dumpPos == 22L)
    } finally server.close()
  }

  test("GTID-flavor checkpoint: the dump falls back to the start file " +
    "and the flavor-safe guard re-appends rather than mis-skipping") {
    val server = new ServerSocket(0)
    try {
      val sess = serveDump(server, "sekret", streamEvents(2L, "b"))
      val src = new MysqlSocketSource("127.0.0.1",
        server.getLocalPort, password = "sekret")
      val wal = tmp("mywire_wal3")
      val gtid = "3e11fa47-71ca-11e1-9e33-c80aa9429562:1-5"
      val (n, cp) = MysqlBinlogFiles.ingestFrom(src, wal,
        afterCheckpoint = gtid)
      assert(n == 1 && cp == "binlog.000002:22")
      assert(sess.dumpPos == 4L) // fell back to the file head
    } finally server.close()
  }

  test("wrong password: the ERR packet surfaces as a descriptive " +
    "failure") {
    val server = new ServerSocket(0)
    try {
      serveDump(server, "sekret", Nil)
      val src = new MysqlSocketSource("127.0.0.1",
        server.getLocalPort, password = "wrong")
      val e = intercept[java.io.IOException] {
        MysqlBinlogFiles.ingestFrom(src, tmp("mywire_wal4"))
      }
      assert(e.getMessage.contains("Access denied"))
      assert(e.getMessage.contains("1045"))
    } finally server.close()
  }

  test("scramble411 follows the documented double-SHA1 construction " +
    "and empty passwords send an empty token") {
    val seed = Array.tabulate(20)(_.toByte)
    val tok = scramble411("pw", seed)
    assert(tok.length == 20)
    // xor-ing back SHA1(seed ++ SHA1(SHA1(pw))) must yield SHA1(pw)
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val h1 = md.digest("pw".getBytes("UTF-8"))
    md.reset()
    val h11 = md.digest(h1)
    md.reset()
    val h2 = md.digest(seed ++ h11)
    val recovered = tok.indices.map(i => (tok(i) ^ h2(i)).toByte)
    assert(recovered == h1.toSeq)
    assert(scramble411("", seed).isEmpty)
  }
}
