package graft.cdc

import java.net.ServerSocket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Live MySQL replication sessions against the in-process server
  * fixture ([[WireServers.serveMysql]]) speaking the documented
  * client/server protocol: handshake v10 with a 20-byte scramble,
  * `mysql_native_password` verification, `COM_REGISTER_SLAVE`,
  * `COM_BINLOG_DUMP`, then the OK-prefixed event stream opened by a
  * fake timestamp-0 Rotate (which seeds the decoder's file cursor
  * exactly as a real server does). The SAME
  * [[MysqlBinlogFiles.ingestFrom]] loop that drains capture files
  * drains the socket — [[MysqlSocketSource]] is just a
  * [[Wire.MysqlSource]]. */
class MysqlWireSpec extends AnyFunSuite {

  import MysqlWire._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

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
      val sess = WireServers.serveMysql(server, "sekret",
        Seq(streamEvents(1L, "a")))
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
      val sess = WireServers.serveMysql(server, "sekret",
        Seq(streamEvents(1L, "a")))
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
      val sess = WireServers.serveMysql(server, "sekret",
        Seq(streamEvents(2L, "b")))
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
      WireServers.serveMysql(server, "sekret", Seq(Nil))
      val src = new MysqlSocketSource("127.0.0.1",
        server.getLocalPort, password = "wrong")
      val e = intercept[java.io.IOException] {
        MysqlBinlogFiles.ingestFrom(src, tmp("mywire_wal4"))
      }
      assert(e.getMessage.contains("Access denied"))
      assert(e.getMessage.contains("1045"))
    } finally server.close()
  }

  test("caching_sha2_password fast path: the SHA256 token passes and " +
    "the 0x01 0x03 status precedes the OK") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.serveMysql(server, "sekret",
        Seq(streamEvents(1L, "a")), plugin = CachingSha2)
      val src = new MysqlSocketSource("127.0.0.1",
        server.getLocalPort, user = "repl", password = "sekret")
      val wal = tmp("mywire_sha2")
      val (n, cp) = MysqlBinlogFiles.ingestFrom(src, wal)
      assert(n == 1 && cp == "binlog.000002:22")
      assert(sess.authOk)
    } finally server.close()
  }

  test("caching_sha2_password full-auth demand surfaces as a " +
    "descriptive failure (TLS/RSA channel out of scope)") {
    val server = new ServerSocket(0)
    try {
      WireServers.serveMysql(server, "sekret", Seq(Nil),
        plugin = CachingSha2, fullAuthDemand = true)
      val src = new MysqlSocketSource("127.0.0.1",
        server.getLocalPort, password = "sekret")
      val e = intercept[java.io.IOException] {
        MysqlBinlogFiles.ingestFrom(src, tmp("mywire_sha2full"))
      }
      assert(e.getMessage.contains("full authentication"))
    } finally server.close()
  }

  test("scrambleSha2 xors back to SHA256(pw) under the documented " +
    "construction") {
    val seed = Array.tabulate(20)(_.toByte)
    val tok = scrambleSha2("pw", seed)
    assert(tok.length == 32)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val h1 = md.digest("pw".getBytes("UTF-8"))
    md.reset(); val h11 = md.digest(h1)
    md.reset(); val h2 = md.digest(h11 ++ seed)
    val recovered = tok.indices.map(i => (tok(i) ^ h2(i)).toByte)
    assert(recovered == h1.toSeq)
  }

  test("split packets reassemble: a 16MB+ logical payload arrives as " +
    "0xFFFFFF fragments plus a remainder") {
    val big = new Array[Byte](MaxPacketBytes + 5)
    java.util.Arrays.fill(big, 0x61.toByte)
    big(MaxPacketBytes + 4) = 0x7A
    val bos = new java.io.ByteArrayOutputStream()
    writePacket(bos, 0, java.util.Arrays.copyOf(big, MaxPacketBytes))
    writePacket(bos, 1,
      java.util.Arrays.copyOfRange(big, MaxPacketBytes, big.length))
    // a small packet follows; reassembly must not consume it
    writePacket(bos, 2, Array(0x0E.toByte))
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val Some((seq, whole)) = readFullPacket(in)
    assert(seq == 0 && whole.length == big.length)
    assert(whole(whole.length - 1) == 0x7A)
    assert(readFullPacket(in).exists(_._2.sameElements(
      Array(0x0E.toByte))))
    // an exactly-16MB-1 payload is NOT continued
    val bos2 = new java.io.ByteArrayOutputStream()
    writePacket(bos2, 0, new Array[Byte](MaxPacketBytes - 1))
    val in2 = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos2.toByteArray))
    assert(readFullPacket(in2).exists(_._2.length ==
      MaxPacketBytes - 1))
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
